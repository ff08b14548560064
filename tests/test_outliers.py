"""Outlier-lane (two-species) tile engine vs the exact gather engine on a
strong-h-contrast distribution — the regime where round 1's mono-level
grid fell back (VERDICT r1 item 2)."""

import numpy as np

import jax
import jax.numpy as jnp

from sphtpu.engine import EngineConfig, Params
from sphtpu.engine.step import force_eval
from sphtpu.physics.tiles import choose_tile_params, choose_tile_params_ml


def _two_scale(n=6000, kh=24, seed=11):
    """Flat-centered dense core + broad halo: the collapsed-fragment
    profile (h contrast ~8x with a bounded core occupancy, unlike a pure
    gaussian whose h shrinks without limit toward the center)."""
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(seed)
    n_core = int(0.6 * n)

    def ball(count, radius):
        u = rng.random(count) ** (1 / 3)
        d = rng.standard_normal((count, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        return d * (radius * u)[:, None]

    core = ball(n_core, 0.25)
    halo = ball(n - n_core, 1.0)
    pos = np.concatenate([core, halo]).astype(np.float32)
    vel = (0.1 * rng.standard_normal((n, 3))).astype(np.float32)
    d, _ = cKDTree(pos).query(pos, k=kh)
    h0 = (d[:, -1] / 2).astype(np.float32)
    K = (1.0 + 0.1 * rng.random(n)).astype(np.float32)
    return pos, vel, K, h0


def _params(jd=jnp.float32):
    return Params(
        m=jnp.asarray(1.0 / 6000, jd), gamma=jnp.asarray(5 / 3, jd),
        cs0=jnp.asarray(0.5, jd), alpha=jnp.asarray(1.0, jd),
        beta=jnp.asarray(2.0, jd), U0=jnp.asarray(0.0, jd),
        t_end=jnp.asarray(1e9, jd),
    )


def test_ml_chooser_finds_split_where_mono_fails():
    pos, vel, K, h0 = _two_scale()
    assert choose_tile_params(pos, h0, 24) is None  # mono-level defeated
    tp = choose_tile_params_ml(pos, h0, 24)
    assert tp is not None
    grid, cap, budget = tp
    assert budget > 0
    # the in-jit species formula must fit the budget
    from sphtpu.physics.outliers import OUTLIER_CUT

    half = float(np.abs(pos).max()) * (1 + 1e-6)
    s = 2 * half / grid
    assert int(np.sum(h0 * OUTLIER_CUT > s)) <= budget


def test_outlier_engine_matches_gather_oracle():
    pos, vel, K, h0 = _two_scale()
    n, kh = pos.shape[0], 24
    grid, cap, budget = choose_tile_params_ml(pos, h0, kh)

    P, V = jnp.asarray(pos), jnp.asarray(vel)
    Kj, H = jnp.asarray(K), jnp.asarray(h0)
    params = _params()

    cfg_tile = EngineConfig(
        n=n, kh=kh, eos="polytropic", tile=(grid, cap),
        outlier_budget=budget,
    )
    cfg_gather = EngineConfig(n=n, kh=kh, eos="polytropic")

    acc_t, red_t, phi_t, fb_t = jax.jit(
        lambda: force_eval(cfg_tile, params, P, V, Kj, H)
    )()
    acc_g, red_g, phi_g, fb_g = jax.jit(
        lambda: force_eval(cfg_gather, params, P, V, Kj, H)
    )()
    assert not bool(fb_t), "outlier engine must certify, not fall back"

    np.testing.assert_allclose(
        np.asarray(red_t.h), np.asarray(red_g.h), rtol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(red_t.rho), np.asarray(red_g.rho), rtol=2e-5
    )
    scale = np.abs(np.asarray(acc_g)).max()
    np.testing.assert_allclose(
        np.asarray(acc_t), np.asarray(acc_g), rtol=2e-4, atol=3e-5 * scale
    )
    np.testing.assert_allclose(
        np.asarray(phi_t), np.asarray(phi_g), rtol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(red_t.visc_dk), np.asarray(red_g.visc_dk),
        rtol=2e-4, atol=1e-6 * np.abs(np.asarray(red_g.visc_dk)).max(),
    )
    np.testing.assert_allclose(
        np.asarray(red_t.div_sum), np.asarray(red_g.div_sum),
        rtol=2e-4, atol=1e-6 * np.abs(np.asarray(red_g.div_sum)).max(),
    )
    np.testing.assert_allclose(
        np.asarray(red_t.mu_max), np.asarray(red_g.mu_max),
        rtol=1e-4, atol=1e-6,
    )


def test_outlier_engine_isothermal_and_pallas():
    """Isothermal EOS + the pallas phase-A path both compose with the
    outlier lane. (Small n: the pallas leg runs in interpret mode, which
    costs minutes per thousand cells.)"""
    pos, vel, K, h0 = _two_scale(n=1500, kh=16, seed=13)
    n, kh = pos.shape[0], 16
    grid, cap, budget = choose_tile_params_ml(pos, h0, kh)
    P, V = jnp.asarray(pos), jnp.asarray(vel)
    H = jnp.asarray(h0)
    params = _params()

    for pallas in (False, True):
        cfg_tile = EngineConfig(
            n=n, kh=kh, eos="isothermal", tile=(grid, cap),
            outlier_budget=budget,
            pallas_a=pallas,
        )
        # pallas_a=True on CPU requires interpret mode: call tiles directly
        if pallas:
            from sphtpu.physics.tiles import tile_sph_forces

            tf, gcorr, ok = tile_sph_forces(
                P, V, params.m, jnp.zeros(n), H,
                eos="isothermal", gamma=params.gamma, cs0=params.cs0,
                alpha=params.alpha, beta=params.beta, kh=kh,
                grid=grid, cap=cap, outlier_budget=budget,
                pallas_a=True, pallas_interpret=True,
            )
            assert bool(ok)
            acc_t, red_t = tf.acc, tf
        else:
            acc_full, red_t, phi_t, fb = jax.jit(
                lambda: force_eval(cfg_tile, params, P, V, jnp.zeros(n), H)
            )()
            assert not bool(fb)
            acc_t = None
        cfg_gather = EngineConfig(n=n, kh=kh, eos="isothermal")
        _, red_g, _, _ = jax.jit(
            lambda: force_eval(cfg_gather, params, P, V, jnp.zeros(n), H)
        )()
        np.testing.assert_allclose(
            np.asarray(red_t.rho), np.asarray(red_g.rho), rtol=2e-5
        )
        scale = np.abs(np.asarray(red_g.acc)).max()
        np.testing.assert_allclose(
            np.asarray(red_t.acc), np.asarray(red_g.acc),
            rtol=2e-4, atol=3e-5 * scale,
        )
