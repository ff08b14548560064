"""Masked cell-tile engine vs the gather engine: identical physics."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import cKDTree

from sphtpu.physics import sph_forces
from sphtpu.physics.tiles import choose_tile_params, tile_sph_forces


def _uniform_ball(n, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.random(n) ** (1 / 3)
    dirs = rng.standard_normal((n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pos = u[:, None] * dirs
    vel = 0.3 * rng.standard_normal((n, 3))
    return pos, vel


@pytest.mark.parametrize("eos", ["polytropic", "isothermal"])
def test_tiles_match_gather_engine(eos):
    n, kh = 4000, 16
    pos, vel = _uniform_ball(n)
    d, _ = cKDTree(pos).query(pos, k=kh)
    h_true = d[:, -1] / 2
    g, cap = choose_tile_params(pos, h_true, kh)
    K = 1.0 + 0.2 * np.random.default_rng(1).random(n)
    kw = dict(gamma=5 / 3, cs0=0.6, alpha=1.0, beta=2.0, kh=kh)
    m = 1.0 / n

    ref = sph_forces(
        jnp.asarray(pos), jnp.asarray(vel), m, jnp.asarray(K), eos=eos, **kw
    )
    out, gcorr, ok = tile_sph_forces(
        jnp.asarray(pos),
        jnp.asarray(vel),
        m,
        jnp.asarray(K),
        jnp.asarray(h_true),
        eos=eos,
        grid=g,
        cap=cap,
        **kw,
    )
    assert bool(ok), f"tile engine failed certification at grid={g}"

    # gravity split: Newtonian sweep + tile correction == softened all-pairs
    from sphtpu.physics import gravity_allpairs, gravity_newton_allpairs

    g_soft, phi_soft = gravity_allpairs(jnp.asarray(pos), out.h, m)
    g_newt, phi_newt = gravity_newton_allpairs(jnp.asarray(pos), m)
    g_split = np.asarray(g_newt) + np.stack([np.asarray(x) for x in gcorr[:3]], 1)
    phi_split = np.asarray(phi_newt) + np.asarray(gcorr[3])
    np.testing.assert_allclose(
        g_split, np.asarray(g_soft), rtol=1e-9,
        atol=1e-11 * np.abs(np.asarray(g_soft)).max(),
    )
    np.testing.assert_allclose(phi_split, np.asarray(phi_soft), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out.h), np.asarray(ref.h), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.rho), np.asarray(ref.rho), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.cs), np.asarray(ref.cs), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(out.acc), np.asarray(ref.acc), rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out.mu_max), np.asarray(ref.mu_max), rtol=1e-10, atol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(out.div_sum), np.asarray(ref.div_sum), rtol=1e-9, atol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(out.visc_dk), np.asarray(ref.visc_dk), rtol=1e-8, atol=1e-15
    )


def test_tiles_certification_fails_on_bad_grid():
    """A grid too coarse for cap (slot overflow) or too fine for 2h must
    report ok=False, never wrong numbers."""
    n, kh = 1500, 24
    pos, vel = _uniform_ball(n, seed=2)
    d, _ = cKDTree(pos).query(pos, k=kh)
    h_true = d[:, -1] / 2
    K = jnp.ones(n)
    kw = dict(
        eos="polytropic", gamma=5 / 3, cs0=0.0, alpha=1.0, beta=2.0, kh=kh
    )
    # far too fine: r_k > cell edge
    _, _, ok_fine = tile_sph_forces(
        jnp.asarray(pos), jnp.asarray(vel), 1.0 / n, K,
        jnp.asarray(h_true), grid=64, cap=8, **kw,
    )
    assert not bool(ok_fine)
    # far too coarse: occupancy blows the slot capacity
    _, _, ok_coarse = tile_sph_forces(
        jnp.asarray(pos), jnp.asarray(vel), 1.0 / n, K,
        jnp.asarray(h_true), grid=4, cap=8, **kw,
    )
    assert not bool(ok_coarse)


def test_tiles_f32_matches_gather_f64():
    """Production-precision lane for the round-4 phase-B rewrite (ADVICE
    r4): the tile engine's inlined inv_r = rsqrt(d2) polynomial forms are
    only reassociation-equal to the kernels/ helpers in exact arithmetic —
    at f32, rsqrt and the reassociated products differ at roundoff, and a
    branch-boundary slot (q <= 1 / q <= 2 / gmask) can flip sides. All
    branch boundaries are continuous (W' and the softened-minus-Newton
    corrections vanish at q = 2), so flips are physics-neutral; this pins
    the f32 tile path against the f64 gather oracle at the tolerance that
    continuity argument predicts."""
    n, kh = 4000, 16
    pos, vel = _uniform_ball(n, seed=3)
    d, _ = cKDTree(pos).query(pos, k=kh)
    h_true = d[:, -1] / 2
    g, cap = choose_tile_params(pos, h_true, kh)
    K = 1.0 + 0.2 * np.random.default_rng(1).random(n)
    kw = dict(gamma=5 / 3, cs0=0.0, alpha=1.0, beta=2.0, kh=kh)
    m = 1.0 / n

    ref = sph_forces(
        jnp.asarray(pos), jnp.asarray(vel), m, jnp.asarray(K),
        eos="polytropic", **kw,
    )
    f32 = jnp.float32
    out, gcorr, ok = tile_sph_forces(
        jnp.asarray(pos, f32),
        jnp.asarray(vel, f32),
        np.float32(m),
        jnp.asarray(K, f32),
        jnp.asarray(h_true, f32),
        eos="polytropic",
        grid=g,
        cap=cap,
        **kw,
    )
    assert bool(ok)
    scale = float(np.abs(np.asarray(ref.acc)).max())
    np.testing.assert_allclose(
        np.asarray(out.h), np.asarray(ref.h), rtol=3e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.rho), np.asarray(ref.rho), rtol=2e-5
    )
    # pair-force sums: f32 accumulation roundoff over ~kh terms plus the
    # rsqrt forms; tolerance relative to the force scale, not per-element
    np.testing.assert_allclose(
        np.asarray(out.acc), np.asarray(ref.acc),
        rtol=5e-4, atol=3e-5 * scale,
    )
    vscale = float(np.abs(np.asarray(ref.visc_dk)).max())
    np.testing.assert_allclose(
        np.asarray(out.visc_dk), np.asarray(ref.visc_dk),
        rtol=5e-4, atol=3e-5 * max(vscale, 1e-30),
    )
    # gravity corrections at f32 against the f64 softened oracle
    from sphtpu.physics import gravity_allpairs, gravity_newton_allpairs

    g_soft, phi_soft = gravity_allpairs(jnp.asarray(pos), ref.h, m)
    g_newt, phi_newt = gravity_newton_allpairs(jnp.asarray(pos), m)
    g_split = np.asarray(g_newt) + np.stack(
        [np.asarray(x, np.float64) for x in gcorr[:3]], 1
    )
    gscale = float(np.abs(np.asarray(g_soft)).max())
    np.testing.assert_allclose(
        g_split, np.asarray(g_soft), rtol=5e-4, atol=3e-5 * gscale,
    )
