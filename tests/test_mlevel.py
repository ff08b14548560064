"""Multi-level tile engine (physics/mlevel.py) vs the exact gather engine.

The regime under test is round 2's weak spot (VERDICT r2 item 1): strong
h contrast, where the two-species outlier lane degraded to O(B*N) with
B ~ 2/3 N. The multi-level engine must certify AND match the gather
oracle to float64 roundoff — including on (a subsample of) the committed
deep-collapse fixture bench_data/bb_collapsed.npz.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sphtpu.engine import EngineConfig, Params, State
from sphtpu.engine.step import force_eval, make_chunk_runner
from sphtpu.physics import sph_forces
from sphtpu.physics.gravity import gravity_allpairs, gravity_newton_allpairs
from sphtpu.physics.mlevel import (
    MLArgs,
    mlevel_args_still_ok,
    mlevel_sph_forces,
    plan_mlevel,
)

FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "bench_data", "bb_collapsed.npz"
)


def _two_scale(n=4000, kh=24, seed=11):
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(seed)
    n_core = int(0.6 * n)

    def ball(count, radius):
        u = rng.random(count) ** (1 / 3)
        d = rng.standard_normal((count, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        return d * (radius * u)[:, None]

    pos = np.concatenate([ball(n_core, 0.25), ball(n - n_core, 1.0)])
    vel = 0.1 * rng.standard_normal((n, 3))
    d, _ = cKDTree(pos).query(pos, k=kh)
    return pos, vel, 1.0 + 0.1 * rng.random(n), d[:, -1] / 2.0


def _dev_args(args):
    return MLArgs(
        act_a=tuple(tuple(jnp.asarray(b) for b in lvl) for lvl in args.act_a),
        act_b=tuple(tuple(jnp.asarray(b) for b in lvl) for lvl in args.act_b),
        act_c=None
        if args.act_c is None
        else tuple(jnp.asarray(b) for b in args.act_c),
        species=jnp.asarray(args.species),
    )


def _params(m, eos="polytropic", cs0=0.0):
    jd = jnp.float64
    return Params(
        m=jnp.asarray(m, jd), gamma=jnp.asarray(5 / 3, jd),
        cs0=jnp.asarray(cs0, jd), alpha=jnp.asarray(1.0, jd),
        beta=jnp.asarray(2.0, jd), U0=jnp.asarray(0.0, jd),
        t_end=jnp.asarray(1e9, jd),
    )


def _assert_parity(red, gcorr, sf, g_soft, phi_soft, pos, m):
    gn, phin = gravity_newton_allpairs(jnp.asarray(pos), m)
    g_ml = np.asarray(gn + jnp.stack(gcorr[:3], axis=1))
    phi_ml = np.asarray(phin + gcorr[3])
    np.testing.assert_allclose(np.asarray(red.h), np.asarray(sf.h), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(red.rho), np.asarray(sf.rho), rtol=1e-11
    )
    scale = np.abs(np.asarray(sf.acc)).max()
    np.testing.assert_allclose(
        np.asarray(red.acc), np.asarray(sf.acc), rtol=1e-9, atol=1e-11 * scale
    )
    np.testing.assert_allclose(
        np.asarray(red.div_sum), np.asarray(sf.div_sum), rtol=1e-9,
        atol=1e-11 * np.abs(np.asarray(sf.div_sum)).max(),
    )
    np.testing.assert_allclose(
        np.asarray(red.mu_max), np.asarray(sf.mu_max), rtol=1e-9, atol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(red.visc_dk), np.asarray(sf.visc_dk), rtol=1e-9,
        atol=1e-11 * np.abs(np.asarray(sf.visc_dk)).max(),
    )
    np.testing.assert_allclose(
        g_ml, np.asarray(g_soft), rtol=1e-9,
        atol=1e-11 * np.abs(np.asarray(g_soft)).max(),
    )
    np.testing.assert_allclose(phi_ml, np.asarray(phi_soft), rtol=1e-10)


def test_mlevel_matches_gather_two_scale():
    pos, vel, K, h0 = _two_scale()
    n, kh = pos.shape[0], 24
    res = plan_mlevel(pos, h0, kh, gravity="exact")
    assert res is not None
    spec, args = res
    assert len(spec[0]) > 1 or spec[1] > 0, "contrast state must split"

    P, V, Kj, H = map(jnp.asarray, (pos, vel, K, h0))
    m = 1.0 / n
    red, gcorr, ok = mlevel_sph_forces(
        P, V, m, Kj, H, _dev_args(args), eos="polytropic", gamma=5 / 3,
        cs0=0.0, alpha=1.0, beta=2.0, kh=kh, spec=spec,
    )
    assert bool(ok), "multi-level engine must certify on its own plan"
    sf = sph_forces(
        P, V, m, Kj, eos="polytropic", gamma=5 / 3, cs0=0.0,
        alpha=1.0, beta=2.0, kh=kh,
    )
    g_soft, phi_soft = gravity_allpairs(P, sf.h, m)
    _assert_parity(red, gcorr, sf, g_soft, phi_soft, pos, m)


def test_mlevel_isothermal():
    pos, vel, K, h0 = _two_scale(n=2500, kh=16, seed=7)
    n, kh = pos.shape[0], 16
    res = plan_mlevel(pos, h0, kh, gravity="exact")
    assert res is not None
    spec, args = res
    P, V, H = map(jnp.asarray, (pos, vel, h0))
    m = 1.0 / n
    red, gcorr, ok = mlevel_sph_forces(
        P, V, m, jnp.zeros(n), H, _dev_args(args), eos="isothermal",
        gamma=5 / 3, cs0=0.5, alpha=1.0, beta=2.0, kh=kh, spec=spec,
    )
    assert bool(ok)
    sf = sph_forces(
        P, V, m, jnp.zeros(n), eos="isothermal", gamma=5 / 3, cs0=0.5,
        alpha=1.0, beta=2.0, kh=kh,
    )
    g_soft, phi_soft = gravity_allpairs(P, sf.h, m)
    _assert_parity(red, gcorr, sf, g_soft, phi_soft, pos, m)


def test_mlevel_collapse_fixture_parity():
    """The VERDICT r2 'done' criterion: mlevel == gather on the committed
    deep-collapse state (subsampled for the CPU suite; the full-N state
    runs on TPU via the hard-regime bench)."""
    d = np.load(FIXTURE)
    step = 5
    pos = d["pos"][::step].astype(np.float64)
    vel = d["vel"][::step].astype(np.float64)
    K = d["K"][::step].astype(np.float64)
    n = pos.shape[0]
    kh = 32
    from scipy.spatial import cKDTree

    dk, _ = cKDTree(pos).query(pos, k=kh)
    h0 = dk[:, -1] / 2.0
    contrast = (h0.max() / np.quantile(h0, 0.01)) ** 3
    assert contrast > 50, "fixture subsample must keep strong contrast"

    res = plan_mlevel(pos, h0, kh, gravity="exact")
    assert res is not None
    spec, args = res
    P, V, Kj, H = map(jnp.asarray, (pos, vel, K, h0))
    m = float(d["m"]) * step
    red, gcorr, ok = mlevel_sph_forces(
        P, V, m, Kj, H, _dev_args(args), eos="polytropic", gamma=5 / 3,
        cs0=0.0, alpha=1.0, beta=2.0, kh=kh, spec=spec,
    )
    assert bool(ok), "must certify on the deep-collapse state"
    sf = sph_forces(
        P, V, m, Kj, eos="polytropic", gamma=5 / 3, cs0=0.0,
        alpha=1.0, beta=2.0, kh=kh,
    )
    g_soft, phi_soft = gravity_allpairs(P, sf.h, m)
    _assert_parity(red, gcorr, sf, g_soft, phi_soft, pos, m)


def test_mlevel_p3m_certifies_and_tracks_exact():
    """p3m mode: mesh + phase C + per-level corrections reproduce the
    softened interaction to mesh accuracy on a contrast state."""
    pos, vel, K, h0 = _two_scale(n=2500, kh=16, seed=3)
    n, kh = pos.shape[0], 16
    res = plan_mlevel(pos, h0, kh, gravity="p3m")
    assert res is not None
    spec, args = res
    assert spec[2] == 0 and len(spec[3]) > 0
    assert all(nc_b > 0 for _, nc_b in spec[3])
    P, V, Kj, H = map(jnp.asarray, (pos, vel, K, h0))
    m = 1.0 / n

    cfg = EngineConfig(
        n=n, kh=kh, eos="polytropic", dtype="float64", mlevel=spec,
        gravity="p3m",
    )
    p = _params(m)
    acc, red, phi, fb = jax.jit(
        lambda: force_eval(cfg, p, P, V, Kj, H, mlargs=_dev_args(args))
    )()
    assert not bool(fb)
    # oracle: hydro + exact softened gravity
    sf = sph_forces(
        P, V, m, Kj, eos="polytropic", gamma=5 / 3, cs0=0.0,
        alpha=1.0, beta=2.0, kh=kh,
    )
    g_soft, phi_soft = gravity_allpairs(P, sf.h, m)
    acc_or = np.asarray(sf.acc - g_soft)
    rms = np.sqrt((np.asarray(g_soft) ** 2).sum(1).mean())
    err = np.sqrt(
        ((np.asarray(acc) - acc_or) ** 2).sum(1)
    )
    assert np.sqrt((err**2).mean()) < 2e-3 * rms
    relp = (np.asarray(phi) - np.asarray(phi_soft)) / np.asarray(phi_soft)
    assert np.sqrt((relp**2).mean()) < 1e-3


def test_mlevel_chunk_runner_and_hysteresis():
    """Engine integration: a chunk of KDK steps on cfg.mlevel matches the
    gather engine trajectory; mlevel_args_still_ok refreshes the active
    lists for the drifted state without a new spec."""
    pos, vel, K, h0 = _two_scale(n=2500, kh=16, seed=5)
    n, kh = pos.shape[0], 16
    res = plan_mlevel(pos, h0, kh, gravity="exact")
    assert res is not None
    spec, args = res
    m = 1.0 / n
    p = _params(m)
    st = State(
        pos=jnp.asarray(pos), vel=jnp.asarray(vel), K=jnp.asarray(K),
        t=jnp.asarray(0.0),
    )
    cfg_ml = EngineConfig(
        n=n, kh=kh, eos="polytropic", dtype="float64", mlevel=spec
    )
    cfg_ga = EngineConfig(n=n, kh=kh, eos="polytropic", dtype="float64")
    ch_ml = make_chunk_runner(cfg_ml)
    ch_ga = make_chunk_runner(cfg_ga)
    out_ml = ch_ml(st, p, jnp.asarray(h0), n_steps=3, mlargs=_dev_args(args))
    out_ga = ch_ga(st, p, jnp.asarray(h0), n_steps=3)
    assert int(np.asarray(out_ml[5]).sum()) == 0, "no fallbacks expected"
    np.testing.assert_allclose(
        np.asarray(out_ml[0].pos), np.asarray(out_ga[0].pos),
        rtol=1e-8, atol=1e-10 * np.abs(np.asarray(out_ga[0].pos)).max(),
    )
    np.testing.assert_allclose(
        np.asarray(out_ml[1]), np.asarray(out_ga[1]), rtol=1e-7
    )

    # hysteresis: refreshed args for the drifted state keep certifying
    pos2 = np.asarray(out_ml[0].pos)
    h2 = np.asarray(out_ml[3])
    args2 = mlevel_args_still_ok(pos2, h2, spec)
    assert args2 is not None
    red2, _, ok2 = mlevel_sph_forces(
        out_ml[0].pos, out_ml[0].vel, m, out_ml[0].K, out_ml[3],
        _dev_args(args2), eos="polytropic", gamma=5 / 3, cs0=0.0,
        alpha=1.0, beta=2.0, kh=kh, spec=spec,
    )
    assert bool(ok2)


def test_mlevel_pallas_phase_a_matches_xla():
    """The VMEM-resident Pallas phase A (kernels/pallas_strip_knn.py,
    interpret mode on CPU) must reproduce the XLA strip path: identical
    found h (both bisections converge to the same f32 fixed point),
    density/forces to f32 reassociation roundoff, and the same
    certificate."""
    pos, vel, K, h0 = _two_scale()
    n = pos.shape[0]
    kh = 24
    res = plan_mlevel(pos, h0, kh, gravity="exact")
    assert res is not None
    spec, args = res
    f32 = jnp.float32
    kw = dict(
        eos="polytropic", gamma=f32(5 / 3), cs0=f32(0.0), alpha=f32(1.0),
        beta=f32(2.0), kh=kh, spec=spec,
    )
    inp = (
        jnp.asarray(pos, f32), jnp.asarray(vel, f32), f32(1.0 / n),
        jnp.asarray(K, f32), jnp.asarray(h0, f32), _dev_args(args),
    )
    red1, gc1, ok1 = mlevel_sph_forces(*inp, **kw)
    red2, gc2, ok2 = mlevel_sph_forces(
        *inp, pallas_a=True, pallas_interpret=True, **kw
    )
    assert bool(ok1) and bool(ok2)
    np.testing.assert_array_equal(np.asarray(red1.h), np.asarray(red2.h))
    np.testing.assert_allclose(
        np.asarray(red1.rho), np.asarray(red2.rho), rtol=3e-6
    )
    scale = float(np.abs(np.asarray(red1.acc)).max())
    np.testing.assert_allclose(
        np.asarray(red1.acc), np.asarray(red2.acc), atol=3e-6 * scale
    )
    for a, b in zip(gc1, gc2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
