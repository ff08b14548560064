"""Block-compact engine (physics/blocks.py) vs the exact gather engine.

The block engine is the third-generation neighbor engine: packed query
blocks, per-row reach windows, owner-sweep pair terms with scatter-back
(no rev-reach coverage). It must certify AND match the gather oracle to
float64 roundoff on contrast states — including (a subsample of) the
committed deep-collapse fixture bench_data/bb_collapsed.npz — and fall
back via its certificate, never silently.
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
from sphtpu.physics.blocks import (
    BlockArgs,
    block_args_for_spec,
    block_sph_forces,
    plan_blocks,
)

FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "bench_data", "bb_collapsed.npz"
)
# round-3 deep fixture: contrast ~1001, cut at the campaign's peak
FIXTURE_DEEP = os.path.join(
    os.path.dirname(__file__), "..", "bench_data", "bb_collapsed_deep.npz"
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


def _dev_args(a):
    return BlockArgs(
        order_q=jnp.asarray(a.order_q),
        order_c=jnp.asarray(a.order_c),
        pos_ref=jnp.asarray(a.pos_ref),
        half_ref=jnp.asarray(a.half_ref),
        boxes=tuple(jnp.asarray(b) for b in a.boxes),
        starts=tuple(jnp.asarray(s) for s in a.starts),
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
    g_blk = np.asarray(gn + jnp.stack(gcorr[:3], axis=1))
    phi_blk = np.asarray(phin + gcorr[3])
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
        g_blk, np.asarray(g_soft), rtol=1e-9,
        atol=1e-11 * np.abs(np.asarray(g_soft)).max(),
    )
    np.testing.assert_allclose(phi_blk, np.asarray(phi_soft), rtol=1e-10)


def _oracle(P, V, m, Kj, kh, eos="polytropic", cs0=0.0):
    sf = sph_forces(
        P, V, m, Kj, eos=eos, gamma=5 / 3, cs0=cs0,
        alpha=1.0, beta=2.0, kh=kh,
    )
    g_soft, phi_soft = gravity_allpairs(P, sf.h, m)
    return sf, g_soft, phi_soft


def test_blocks_matches_gather_two_scale():
    pos, vel, K, h0 = _two_scale()
    n, kh = pos.shape[0], 24
    res = plan_blocks(pos, h0, kh, gravity="exact")
    assert res is not None
    spec, args = res

    P, V, Kj, H = map(jnp.asarray, (pos, vel, K, h0))
    m = 1.0 / n
    red, gcorr, ok = block_sph_forces(
        P, V, m, Kj, H, _dev_args(args), eos="polytropic", gamma=5 / 3,
        cs0=0.0, alpha=1.0, beta=2.0, kh=kh, spec=spec,
    )
    assert bool(ok), "block engine must certify on its own plan"
    sf, g_soft, phi_soft = _oracle(P, V, m, Kj, kh)
    _assert_parity(red, gcorr, sf, g_soft, phi_soft, pos, m)


def test_blocks_isothermal():
    pos, vel, K, h0 = _two_scale(n=2500, kh=16, seed=7)
    n, kh = pos.shape[0], 16
    res = plan_blocks(pos, h0, kh, gravity="exact")
    assert res is not None
    spec, args = res
    P, V, H = map(jnp.asarray, (pos, vel, h0))
    m = 1.0 / n
    red, gcorr, ok = block_sph_forces(
        P, V, m, jnp.zeros(n), H, _dev_args(args), eos="isothermal",
        gamma=5 / 3, cs0=0.5, alpha=1.0, beta=2.0, kh=kh, spec=spec,
    )
    assert bool(ok)
    sf, g_soft, phi_soft = _oracle(
        P, V, m, jnp.zeros(n), kh, eos="isothermal", cs0=0.5
    )
    _assert_parity(red, gcorr, sf, g_soft, phi_soft, pos, m)


@pytest.mark.parametrize("fixture", [FIXTURE, FIXTURE_DEEP])
def test_blocks_collapse_fixture_parity(fixture):
    """blocks == gather on the committed deep-collapse states (contrast
    ~395 and ~1001; subsampled for the CPU suite — the full-N states run
    on TPU via the bench)."""
    d = np.load(fixture)
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

    res = plan_blocks(pos, h0, kh, gravity="exact")
    assert res is not None
    spec, args = res
    P, V, Kj, H = map(jnp.asarray, (pos, vel, K, h0))
    m = float(d["m"]) * step
    red, gcorr, ok = block_sph_forces(
        P, V, m, Kj, H, _dev_args(args), eos="polytropic", gamma=5 / 3,
        cs0=0.0, alpha=1.0, beta=2.0, kh=kh, spec=spec,
    )
    assert bool(ok), "must certify on the deep-collapse state"
    sf, g_soft, phi_soft = _oracle(P, V, m, Kj, kh)
    _assert_parity(red, gcorr, sf, g_soft, phi_soft, pos, m)


def test_blocks_p3m_tracks_exact():
    """p3m mode: mesh + in-sweep tail corrections reproduce the softened
    interaction to mesh accuracy on a contrast state (the same bound the
    mlevel p3m path meets)."""
    pos, vel, K, h0 = _two_scale(n=2500, kh=16, seed=3)
    n, kh = pos.shape[0], 16
    res = plan_blocks(pos, h0, kh, gravity="p3m")
    assert res is not None
    spec, args = res
    P, V, Kj, H = map(jnp.asarray, (pos, vel, K, h0))
    m = 1.0 / n

    cfg = EngineConfig(
        n=n, kh=kh, eos="polytropic", dtype="float64", blocks=spec,
        gravity="p3m",
    )
    p = _params(m)
    acc, red, phi, fb = jax.jit(
        lambda: force_eval(cfg, p, P, V, Kj, H, mlargs=_dev_args(args))
    )()
    assert not bool(fb)
    sf, g_soft, phi_soft = _oracle(P, V, m, Kj, kh)
    acc_or = np.asarray(sf.acc - g_soft)
    rms = np.sqrt((np.asarray(g_soft) ** 2).sum(1).mean())
    err = np.sqrt(((np.asarray(acc) - acc_or) ** 2).sum(1))
    assert np.sqrt((err**2).mean()) < 2e-3 * rms
    relp = (np.asarray(phi) - np.asarray(phi_soft)) / np.asarray(phi_soft)
    assert np.sqrt((relp**2).mean()) < 1e-3


def test_blocks_chunk_runner_and_spec_refresh():
    """Engine integration: a chunk of KDK steps on cfg.blocks matches the
    gather engine trajectory; block_args_for_spec refits the drifted
    state into the SAME compiled spec (no recompile) and still
    certifies."""
    pos, vel, K, h0 = _two_scale(n=2500, kh=16, seed=5)
    n, kh = pos.shape[0], 16
    res = plan_blocks(pos, h0, kh, gravity="exact")
    assert res is not None
    spec, args = res
    m = 1.0 / n
    p = _params(m)
    st = State(
        pos=jnp.asarray(pos), vel=jnp.asarray(vel), K=jnp.asarray(K),
        t=jnp.asarray(0.0),
    )
    cfg_bl = EngineConfig(
        n=n, kh=kh, eos="polytropic", dtype="float64", blocks=spec
    )
    cfg_ga = EngineConfig(n=n, kh=kh, eos="polytropic", dtype="float64")
    ch_bl = make_chunk_runner(cfg_bl)
    ch_ga = make_chunk_runner(cfg_ga)
    out_bl = ch_bl(st, p, jnp.asarray(h0), n_steps=3, mlargs=_dev_args(args))
    out_ga = ch_ga(st, p, jnp.asarray(h0), n_steps=3)
    assert int(np.asarray(out_bl[5]).sum()) == 0, "no fallbacks expected"
    np.testing.assert_allclose(
        np.asarray(out_bl[0].pos), np.asarray(out_ga[0].pos),
        rtol=1e-8, atol=1e-10 * np.abs(np.asarray(out_ga[0].pos)).max(),
    )
    np.testing.assert_allclose(
        np.asarray(out_bl[1]), np.asarray(out_ga[1]), rtol=1e-7
    )

    # hysteresis: refit the drifted state into the same compiled spec
    pos2 = np.asarray(out_bl[0].pos)
    h2 = np.asarray(out_bl[3])
    args2 = block_args_for_spec(pos2, h2, spec)
    assert args2 is not None
    red2, _, ok2 = block_sph_forces(
        out_bl[0].pos, out_bl[0].vel, m, out_bl[0].K, out_bl[3],
        _dev_args(args2), eos="polytropic", gamma=5 / 3, cs0=0.0,
        alpha=1.0, beta=2.0, kh=kh, spec=spec,
    )
    assert bool(ok2)
    sf2 = sph_forces(
        out_bl[0].pos, out_bl[0].vel, m, out_bl[0].K, eos="polytropic",
        gamma=5 / 3, cs0=0.0, alpha=1.0, beta=2.0, kh=kh,
    )
    np.testing.assert_allclose(
        np.asarray(red2.h), np.asarray(sf2.h), rtol=1e-12
    )


def test_blocks_cert_rejects_stale_args():
    """Safety net: BlockArgs built for a DIFFERENT state (large coherent
    shift, far past any drift margin) must fail the in-engine
    certificate — the chunk runner then falls back to the gather engine
    instead of producing wrong physics."""
    pos, vel, K, h0 = _two_scale(n=2000, kh=16, seed=9)
    n, kh = pos.shape[0], 16
    res = plan_blocks(pos, h0, kh, gravity="exact")
    assert res is not None
    spec, args = res
    # evaluate at a state shifted by ~10 typical balls
    shift = 20.0 * float(np.median(h0))
    pos2 = pos + np.array([shift, 0.0, 0.0])[None, :]
    P2, V, Kj, H = map(jnp.asarray, (pos2, vel, K, h0))
    m = 1.0 / n
    _, _, ok = block_sph_forces(
        P2, V, m, Kj, H, _dev_args(args), eos="polytropic", gamma=5 / 3,
        cs0=0.0, alpha=1.0, beta=2.0, kh=kh, spec=spec,
    )
    assert not bool(ok), "stale args must trip the certificate"


def test_blocks_pallas_phase_a_matches_xla():
    """The VMEM-resident Pallas phase A (kernels/pallas_strip_knn.py
    reused with (BQ, C_b) block tiles, interpret mode on CPU) must
    reproduce the XLA path: identical found h (both bisections converge
    to the same f32 fixed point), density/forces bit-equal, and the same
    certificate."""
    pos, vel, K, h0 = _two_scale(n=1500, kh=16, seed=13)
    n, kh = pos.shape[0], 16
    res = plan_blocks(pos, h0, kh, gravity="exact")
    assert res is not None
    spec, args = res
    jd = jnp.float32
    P, V, Kj, H = (jnp.asarray(x, jd) for x in (pos, vel, K, h0))

    def dev32(a):
        return BlockArgs(
            order_q=jnp.asarray(a.order_q),
            order_c=jnp.asarray(a.order_c),
            pos_ref=jnp.asarray(a.pos_ref, jd),
            half_ref=jnp.asarray(a.half_ref, jd),
            boxes=tuple(jnp.asarray(b) for b in a.boxes),
            starts=tuple(jnp.asarray(s) for s in a.starts),
        )

    m = 1.0 / n
    kw = dict(
        eos="polytropic", gamma=5 / 3, cs0=0.0, alpha=1.0, beta=2.0,
        kh=kh, spec=spec,
    )
    red_x, _, ok_x = block_sph_forces(
        P, V, m, Kj, H, dev32(args), pallas_a=False, **kw
    )
    red_p, _, ok_p = block_sph_forces(
        P, V, m, Kj, H, dev32(args), pallas_a=True, pallas_interpret=True,
        **kw
    )
    assert bool(ok_x) and bool(ok_p)
    # the two paths compute d2 with different instruction shapes
    # (stacked-axis sum vs per-plane FMA), so the found r_k can differ
    # by 1 f32 ulp; W and grad_W vanish at the ball edge, so that ulp
    # is physically inert — assert ulp-level agreement, not bit equality
    np.testing.assert_allclose(
        np.asarray(red_x.h), np.asarray(red_p.h), rtol=3e-7
    )
    np.testing.assert_allclose(
        np.asarray(red_x.rho), np.asarray(red_p.rho), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(red_x.acc), np.asarray(red_p.acc), rtol=1e-5,
        atol=1e-6 * np.abs(np.asarray(red_x.acc)).max(),
    )


def test_blocks_pallas_phase_b_matches_xla():
    """The VMEM-resident Pallas phase B (kernels/pallas_block_pairs.py,
    opt-in alternate; interpret mode on CPU) must reproduce the XLA
    owner-sweep pair pass to f32 reassociation roundoff in both gravity
    modes."""
    pos, vel, K, h0 = _two_scale(n=1500, kh=16, seed=17)
    n, kh = pos.shape[0], 16
    jd = jnp.float32

    def dev32(a):
        return BlockArgs(
            order_q=jnp.asarray(a.order_q),
            order_c=jnp.asarray(a.order_c),
            pos_ref=jnp.asarray(a.pos_ref, jd),
            half_ref=jnp.asarray(a.half_ref, jd),
            boxes=tuple(jnp.asarray(b) for b in a.boxes),
            starts=tuple(jnp.asarray(s) for s in a.starts),
        )

    m = 1.0 / n
    for grav in ("exact", "p3m"):
        res = plan_blocks(pos, h0, kh, gravity=grav)
        assert res is not None
        spec, args = res
        P, V, Kj, H = (jnp.asarray(x, jd) for x in (pos, vel, K, h0))
        kw = dict(
            eos="polytropic", gamma=5 / 3, cs0=0.0, alpha=1.0, beta=2.0,
            kh=kh, spec=spec, gravity=grav,
        )
        red_x, gc_x, ok_x = block_sph_forces(
            P, V, m, Kj, H, dev32(args), pallas_a=False, **kw
        )
        assert bool(ok_x)
        # pallas_interpret routes the kernels through interpret mode on
        # CPU; grouped=True is the production merged-launch kernel
        # (kernels/pallas_grouped_pairs.py), grouped=False the
        # per-bucket fallback (kernels/pallas_block_pairs.py) — BOTH
        # must reproduce the XLA owner-sweep pass
        for grouped in (True, False):
            red_p, gc_p, ok_p = block_sph_forces(
                P, V, m, Kj, H, dev32(args), pallas_a=True,
                pallas_interpret=True, grouped=grouped, **kw
            )
            assert bool(ok_p), (grav, grouped)
            for name, a, b in [
                ("acc", red_x.acc, red_p.acc),
                ("visc", red_x.visc_dk, red_p.visc_dk),
                ("div", red_x.div_sum, red_p.div_sum),
                ("mu", red_x.mu_max, red_p.mu_max),
                ("g", gc_x[0], gc_p[0]),
                ("phi", gc_x[3], gc_p[3]),
            ]:
                a, b = np.asarray(a), np.asarray(b)
                sc = np.abs(a).max() + 1e-30
                # 6e-6: the kernel evaluates the piecewise forms as
                # polynomials in q = r * inv_h on rsqrt/reciprocals (the
                # round-4 division diet) — algebraically identical to the
                # XLA r/h^k forms (pinned at f64 roundoff by
                # test_blocks_pallas_phase_b_f64_algebra) but
                # reassociated, so f32 element noise runs to ~3e-6
                assert np.abs(a - b).max() / sc < 6e-6, (
                    grav, grouped, name,
                )


def test_blocks_pallas_phase_b_f64_algebra():
    """The division-diet rewrite of the Pallas phase B body (polynomials
    in q on rsqrt/reciprocals) is ALGEBRAICALLY the same math as the XLA
    helpers' r/h^k piecewise forms: at f64 the two paths agree to
    roundoff, so any f32 difference in the test above is reassociation,
    not a formula drift."""
    pos, vel, K, h0 = _two_scale(n=1500, kh=16, seed=17)
    n, kh = pos.shape[0], 16
    jd = jnp.float64

    res = plan_blocks(pos, h0, kh, gravity="exact")
    assert res is not None
    spec, args = res
    P, V, Kj, H = (jnp.asarray(x, jd) for x in (pos, vel, K, h0))
    m = 1.0 / n
    kw = dict(
        eos="polytropic", gamma=5 / 3, cs0=0.0, alpha=1.0, beta=2.0,
        kh=kh, spec=spec, gravity="exact",
    )
    red_x, gc_x, ok_x = block_sph_forces(
        P, V, m, Kj, H, _dev_args(args), pallas_a=False, **kw
    )
    red_p, gc_p, ok_p = block_sph_forces(
        P, V, m, Kj, H, _dev_args(args), pallas_a=True,
        pallas_interpret=True, **kw
    )
    assert bool(ok_x) and bool(ok_p)
    for name, a, b in [
        ("acc", red_x.acc, red_p.acc),
        ("visc", red_x.visc_dk, red_p.visc_dk),
        ("g", gc_x[0], gc_p[0]),
        ("phi", gc_x[3], gc_p[3]),
    ]:
        a, b = np.asarray(a), np.asarray(b)
        sc = np.abs(a).max() + 1e-30
        assert np.abs(a - b).max() / sc < 1e-12, name


def test_blocks_refit_margin_ladder():
    """Two refit-survival properties at the contrast peak (round 4):

    1. drift reserve — the top bucket's spare slot granule + global-max
       run extents (plan_blocks) absorb a 2x uniform h inflation at the
       FULL own-ball margin, with no replan (the round-3 bench paid 4
       replans per 10-step window to exactly this failure);
    2. ladder mechanism — when a rung's geometry cannot fit the
       compiled shapes, block_args_for_spec falls through to the next
       rung, and the degraded-margin args still certify exact and match
       the gather oracle (the per-eval certificate, not the margin, is
       what guards correctness)."""
    import sphtpu.physics.blocks as B

    pos, vel, K, h0 = _two_scale(n=2500, kh=16, seed=21)
    n, kh = pos.shape[0], 16
    res = plan_blocks(pos, h0, kh, gravity="exact")
    assert res is not None
    spec, _ = res

    old_ladder = B.REFIT_MARGINS
    try:
        # 1. full-margin refit must hold through 2x uniform inflation
        B.REFIT_MARGINS = (B.R_OWN_MARGIN,)
        for f in np.arange(1.05, 2.01, 0.05):
            assert block_args_for_spec(pos, h0 * f, spec) is not None, (
                f"drift reserve must absorb uniform inflation x{f:.2f}"
            )
        # 2. an infeasibly wide first rung must fall through to the
        # R_OWN_MARGIN rung (margin 20x inflates every requirement past
        # the compiled shapes), producing usable args
        B.REFIT_MARGINS = (20.0 * B.R_OWN_MARGIN, B.R_OWN_MARGIN)
        f_break = 1.5
        args2 = block_args_for_spec(pos, h0 * f_break, spec)
    finally:
        B.REFIT_MARGINS = old_ladder
    assert args2 is not None, "margin ladder failed where it must hold"

    # and the degraded-margin args still certify exact and match gather
    P, V, Kj = map(jnp.asarray, (pos, vel, K))
    H = jnp.asarray(h0 * f_break)
    m = 1.0 / n
    red, gcorr, ok = block_sph_forces(
        P, V, m, Kj, H, _dev_args(args2), eos="polytropic", gamma=5 / 3,
        cs0=0.0, alpha=1.0, beta=2.0, kh=kh, spec=spec,
    )
    assert bool(ok), "ladder refit must still certify"
    sf, g_soft, phi_soft = _oracle(P, V, m, Kj, kh)
    _assert_parity(red, gcorr, sf, g_soft, phi_soft, pos, m)


def test_fallback_none_discards_failed_steps():
    """EngineConfig.fallback="none" (the N>=1e7 scale mode): the gather
    branch never enters the program; a step whose certificate fails is
    DISCARDED (state unchanged, stats zeroed, n_fb counts it), and on a
    healthy plan the mode is bit-identical to the default path."""
    import jax

    from sphtpu.engine import EngineConfig, Params, State, make_chunk_runner
    from sphtpu.physics.tiles import choose_tile_params

    rng = np.random.default_rng(5)
    n, kh = 1500, 12
    u = rng.random((n, 3))
    r = u[:, 0] ** (1 / 3)
    costh = 2 * u[:, 1] - 1
    ph = 2 * np.pi * u[:, 2]
    sinth = np.sqrt(1 - costh**2)
    pos = np.stack(
        [r * sinth * np.cos(ph), r * sinth * np.sin(ph), r * costh], axis=1
    )
    from scipy.spatial import cKDTree

    h0 = cKDTree(pos).query(pos, k=kh)[0][:, -1] / 2.0
    tp = choose_tile_params(pos, h0, kh)
    assert tp is not None
    jd = jnp.float32
    params = Params(
        m=jnp.asarray(1.0 / n, jd), gamma=jnp.asarray(5 / 3, jd),
        cs0=jnp.asarray(0.0, jd), alpha=jnp.asarray(1.0, jd),
        beta=jnp.asarray(2.0, jd), U0=jnp.asarray(0.0, jd),
        t_end=jnp.asarray(1e30, jd),
    )
    state = State(
        pos=jnp.asarray(pos, jd),
        vel=jnp.asarray(0.05 * rng.standard_normal((n, 3)), jd),
        K=jnp.asarray(0.02 + 0.002 * rng.random(n), jd),
        t=jnp.asarray(0.0, jd),
    )
    h_dev = jnp.asarray(h0, jd)
    kw = dict(n=n, kh=kh, eos="polytropic", dtype="float32", tile=tp)
    chunk_g = make_chunk_runner(EngineConfig(**kw))
    chunk_n = make_chunk_runner(EngineConfig(**kw, fallback="none"))

    # healthy plan: both modes advance identically (to f32 ulp — the
    # removed lax.cond changes XLA's fusion choices), zero fallbacks
    sg, stg, vg, hg, _, nfg = chunk_g(state, params, h_dev, n_steps=2)
    sn, stn, vn, hn, _, nfn = chunk_n(state, params, h_dev, n_steps=2)
    assert int(np.asarray(nfg).sum()) == 0 and int(np.asarray(nfn).sum()) == 0
    np.testing.assert_allclose(
        np.asarray(sg.pos), np.asarray(sn.pos), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(stg), np.asarray(stn), rtol=1e-5, atol=1e-7
    )

    # broken cert (grid far too FINE: cell edge < r_k, so the 27-cell
    # stencil cannot cover the kNN ball): "none" must DISCARD — state
    # bit-unchanged, stats zeroed, fallbacks counted
    cfg_bad = EngineConfig(**{**kw, "tile": (32, 64)}, fallback="none")
    chunk_b = make_chunk_runner(cfg_bad)
    sb, stb, vb, hb, _, nfb = chunk_b(state, params, h_dev, n_steps=1)
    assert int(np.asarray(nfb).sum()) > 0, "coarse grid must fail the cert"
    np.testing.assert_array_equal(np.asarray(sb.pos), np.asarray(state.pos))
    assert float(np.asarray(sb.t)) == 0.0
    assert np.all(np.asarray(stb) == 0.0)
