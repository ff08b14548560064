"""Strip-sharded multi-level engine (shard/mlevel.py) vs single-chip.

VERDICT r2 item 2: the sharded path must cover the deep-collapse regime
the single-chip engine covers — sharded == unsharded on a strong
h-contrast state (including a subsample of the committed deep-collapse
fixture) on the 8-virtual-device CPU mesh, and the driver must stay
sharded (zero forced single-device chunks) when slabs cannot certify.

Reference semantics under test are the same as tests/test_mlevel.py:
h = r_Kh/2 (polytrope_hydroKDTree.jl:151), symmetric pair scatter
(:229-245), softened gravity with the -(7/5)m/h self term
(gravOctree_Single.jl:280-304).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from scipy.spatial import cKDTree

from sphtpu.engine import EngineConfig, Params, State, make_chunk_runner
from sphtpu.physics.mlevel import plan_mlevel
from sphtpu.shard.mlevel import make_ml_chunk_runner, mlargs_tree
from sphtpu.shard.tiles import AXIS, plan_slabs

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
    """(single-chip mlevel chunk, strip-sharded chunk) on the SAME spec
    (planned with shards=n_dev; valid for both since the single-chip
    engine just sweeps the full lists)."""
    n = pos.shape[0]
    res = plan_mlevel(pos, h0, kh, gravity=gravity, shards=n_dev)
    assert res is not None, "state must admit a multi-level plan"
    spec, args = res
    for (g, cap, buckets) in spec[0]:
        for (cb, na_b, nb_b) in buckets:
            assert na_b % n_dev == 0 and nb_b % n_dev == 0
    assert spec[1] % n_dev == 0
    if spec[2] >= 0:
        for (cb, nc_b) in spec[3]:
            assert nc_b % n_dev == 0

    cfg = EngineConfig(
        n=n, kh=kh, eos="polytropic", dtype="float64", mlevel=spec,
        gravity=gravity,
    )
    p = _params(m)
    st = State(
        pos=jnp.asarray(pos, JD), vel=jnp.asarray(vel, JD),
        K=jnp.asarray(K, JD), t=jnp.asarray(0.0, JD),
    )
    h0j = jnp.asarray(h0, JD)
    margs = mlargs_tree(args)

    st1, stats1, valid1, h1, rho1, nfb1 = make_chunk_runner(cfg)(
        st, p, h0j, n_steps=steps, mlargs=margs
    )
    assert int(np.asarray(nfb1).sum()) == 0, "single-chip must certify"

    chunk_s = make_ml_chunk_runner(cfg, _mesh(n_dev))
    st2, stats2, valid2, cert2, h2, rho2 = chunk_s(
        st, p, h0j, margs, n_steps=steps
    )
    assert not bool(np.asarray(cert2).any()), "sharded must certify"
    assert bool(np.asarray(valid2).all())
    return (
        np.asarray(st1.pos), np.asarray(stats1), np.asarray(h1),
        np.asarray(st2.pos), np.asarray(stats2), np.asarray(h2),
    )


def test_ml_sharded_matches_single_two_scale():
    """Full KDK chunk on a strong-contrast state: strip-sharded ==
    single-chip multi-level engine to fp64 roundoff (psum reassociation
    is the only difference)."""
    pos, vel, K, h0 = _two_scale()
    pos_u, stats_u, h_u, pos_s, stats_s, h_s = _run_pair(
        pos, vel, K, h0, 24, 1.0 / pos.shape[0], steps=2
    )
    np.testing.assert_allclose(stats_s, stats_u, rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(pos_s, pos_u, rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(h_s, h_u, rtol=1e-9, atol=1e-13)


def test_ml_sharded_p3m_matches_single():
    pos, vel, K, h0 = _two_scale(n=2500, kh=16, seed=3)
    pos_u, stats_u, h_u, pos_s, stats_s, h_s = _run_pair(
        pos, vel, K, h0, 16, 1.0 / pos.shape[0], steps=2, gravity="p3m",
        n_dev=4,
    )
    np.testing.assert_allclose(stats_s, stats_u, rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(pos_s, pos_u, rtol=1e-9, atol=1e-13)


def test_ml_sharded_collapse_fixture():
    """The VERDICT r2 item-2 bar: sharded == unsharded on the committed
    deep-collapse fixture (subsampled for the CPU suite)."""
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


def test_driver_stays_sharded_in_deep_collapse(tmp_path):
    """When no slab plan certifies (the regime that silently forced
    single-device in round 2, VERDICT weak item 2), the driver must run
    the strip-sharded multi-level engine — zero fallbacks, zero forced
    single-device chunks."""
    from sphtpu import constants as C
    from sphtpu.engine import run_simulation
    from sphtpu.io import write_snapshot
    from sphtpu.units import UnitSystem

    n, kh = 3000, 16
    pos, vel, K, h0 = _two_scale(n=n, kh=kh, seed=5, core_r=0.12)
    assert plan_slabs(pos, h0, kh, 8) is None, (
        "premise: the contrast state must defeat the slab planner"
    )
    assert plan_mlevel(pos, h0, kh, gravity="exact", shards=8) is not None

    M = 1.989e33
    R = 3.086e18
    gamma = 5.0 / 3.0
    u = UnitSystem.from_constants(C.G_CGS, M, R)
    constants = {
        "iterID": 1, "N": n, "Kh": kh, "Kgr": 20, "t": 0.0,
        "tEnd": 1e30, "M": M, "R": R, "alpha": 1.0, "beta": 2.0,
        "theta": 0.576, "G": C.G_CGS, "m": M / n, "gamma": gamma,
    }
    root = str(tmp_path)
    write_snapshot(
        "1", "two_scale", pos * u.L, vel * u.V,
        K=K * u.K_entropy(gamma), constants=constants,
        rlin=np.linspace(0, 1.5 * R, 8), rho_radial=np.zeros(8),
        root=root,
    )
    res = run_simulation(
        "polytropic", "two_scale",
        snap_interval=2, keep_snaps=False, show_plots=False,
        root=root, dtype="float64", n_devices=8, max_steps=2,
        verbose=False,
    )
    assert res["steps"] == 2
    assert res["sharded_chunks"] >= 1, "ml-sharded path never engaged"
    assert res["fallback_evals"] == 0
    assert res["shard_replans"] == 0
    assert np.isfinite(res["last_stats_cgs"]).all()
