"""Work-sharded block-compact engine (shard/blocks.py) vs single-chip.

The sharded path must cover the deep-collapse regime the single-chip
engine covers: sharded == unsharded on strong h-contrast states
(including a subsample of the committed deep-collapse fixture) on the
8-virtual-device CPU mesh. Reference semantics are those of
tests/test_blocks.py (h = r_Kh/2, symmetric pair scatter, softened
gravity — polytrope_hydroKDTree.jl:151,222-248).
"""

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from scipy.spatial import cKDTree

from sphtpu.engine import EngineConfig, Params, State, make_chunk_runner
from sphtpu.physics.blocks import plan_blocks
from sphtpu.shard.blocks import blockargs_tree, make_blocks_chunk_runner
from sphtpu.shard.tiles import AXIS

JD = jnp.float64

FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "bench_data", "bb_collapsed.npz"
)


def _mesh(n_dev=8):
    return Mesh(np.array(jax.devices()[:n_dev]), (AXIS,))


def _two_scale(n=4000, kh=24, seed=11, core_r=0.25):
    rng = np.random.default_rng(seed)
    n_core = int(0.6 * n)

    def ball(count, radius):
        u = rng.random(count) ** (1 / 3)
        d = rng.standard_normal((count, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        return d * (radius * u)[:, None]

    pos = np.concatenate([ball(n_core, core_r), ball(n - n_core, 1.0)])
    vel = 0.1 * rng.standard_normal((n, 3))
    d, _ = cKDTree(pos).query(pos, k=kh)
    return pos, vel, 1.0 + 0.1 * rng.random(n), d[:, -1] / 2.0


def _params(m, t_end=1e9):
    return Params(
        m=jnp.asarray(m, JD), gamma=jnp.asarray(5 / 3, JD),
        cs0=jnp.asarray(0.0, JD), alpha=jnp.asarray(1.0, JD),
        beta=jnp.asarray(2.0, JD), U0=jnp.asarray(0.0, JD),
        t_end=jnp.asarray(t_end, JD),
    )


def _run_pair(pos, vel, K, h0, kh, m, steps, gravity="exact", n_dev=8):
    """(single-chip blocks chunk, work-sharded chunk) on the SAME spec
    (planned with shards=n_dev; valid for both since the single-chip
    engine just sweeps the full block lists)."""
    n = pos.shape[0]
    res = plan_blocks(pos, h0, kh, gravity=gravity, shards=n_dev)
    assert res is not None, "state must admit a block plan"
    spec, args = res
    for (cb, nb) in spec[0]:
        assert nb % n_dev == 0

    cfg = EngineConfig(
        n=n, kh=kh, eos="polytropic", dtype="float64", blocks=spec,
        gravity=gravity,
    )
    p = _params(m)
    st = State(
        pos=jnp.asarray(pos, JD), vel=jnp.asarray(vel, JD),
        K=jnp.asarray(K, JD), t=jnp.asarray(0.0, JD),
    )
    h0j = jnp.asarray(h0, JD)
    bargs = blockargs_tree(args)

    st1, stats1, valid1, h1, rho1, nfb1 = make_chunk_runner(cfg)(
        st, p, h0j, n_steps=steps, mlargs=bargs
    )
    assert int(np.asarray(nfb1).sum()) == 0, "single-chip must certify"

    chunk_s = make_blocks_chunk_runner(cfg, _mesh(n_dev))
    st2, stats2, valid2, cert2, h2, rho2 = chunk_s(
        st, p, h0j, bargs, n_steps=steps
    )
    assert not bool(np.asarray(cert2).any()), "sharded must certify"
    assert bool(np.asarray(valid2).all())
    return (
        np.asarray(st1.pos), np.asarray(stats1), np.asarray(h1),
        np.asarray(st2.pos), np.asarray(stats2), np.asarray(h2),
    )


def test_blocks_sharded_matches_single_two_scale():
    """Full KDK chunk on a strong-contrast state: work-sharded ==
    single-chip block engine to fp64 roundoff (psum reassociation is the
    only difference)."""
    pos, vel, K, h0 = _two_scale()
    pos_u, stats_u, h_u, pos_s, stats_s, h_s = _run_pair(
        pos, vel, K, h0, 24, 1.0 / pos.shape[0], steps=2
    )
    np.testing.assert_allclose(stats_s, stats_u, rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(pos_s, pos_u, rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(h_s, h_u, rtol=1e-9, atol=1e-13)


def test_blocks_sharded_p3m_matches_single():
    pos, vel, K, h0 = _two_scale(n=2500, kh=16, seed=3)
    pos_u, stats_u, h_u, pos_s, stats_s, h_s = _run_pair(
        pos, vel, K, h0, 16, 1.0 / pos.shape[0], steps=2, gravity="p3m",
        n_dev=4,
    )
    np.testing.assert_allclose(stats_s, stats_u, rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(pos_s, pos_u, rtol=1e-9, atol=1e-13)


def test_blocks_sharded_collapse_fixture():
    """Sharded == unsharded on the committed deep-collapse fixture
    (subsampled for the CPU suite)."""
    d = np.load(FIXTURE)
    step = 5
    pos = d["pos"][::step].astype(np.float64)
    vel = d["vel"][::step].astype(np.float64)
    K = d["K"][::step].astype(np.float64)
    kh = 32
    dk, _ = cKDTree(pos).query(pos, k=kh)
    h0 = dk[:, -1] / 2.0
    assert (h0.max() / np.quantile(h0, 0.01)) ** 3 > 50
    pos_u, stats_u, h_u, pos_s, stats_s, h_s = _run_pair(
        pos, vel, K, h0, kh, float(d["m"]) * step, steps=1
    )
    np.testing.assert_allclose(stats_s, stats_u, rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(pos_s, pos_u, rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(h_s, h_u, rtol=1e-9, atol=1e-13)
