"""P3M far-field gravity accuracy: measured against the exact softened
direct sum AND against a C re-implementation of the reference's own
Barnes-Hut walk (theta = 0.576 dual criterion, gravOctree_Single.jl:239-278)
— the bar the TPU far field must match or beat (VERDICT r1 item 1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sphtpu.engine import EngineConfig, Params
from sphtpu.engine.step import force_eval
from sphtpu.physics.mesh_gravity import (
    good_fft_size,
    greens_hat,
    mesh_gphi_over_r,
    mesh_phi,
    p3m_mesh_force,
)
from sphtpu.physics.oracle_bh import bh_gravity, exact_gravity
from sphtpu.physics.tiles import choose_tile_params


def _cloud(n=4096, seed=3, kh=32):
    from scipy.spatial import cKDTree

    from sphtpu.scenes.generators import boss_bodenheimer

    rng = np.random.default_rng(seed)
    pos, _, _ = boss_bodenheimer(n, 1.0, 1.0, rng=rng)
    pos = pos.astype(np.float32)
    d, _ = cKDTree(pos).query(pos, k=kh)
    return pos, (d[:, -1] / 2).astype(np.float32)


def _rms(v):
    return np.sqrt((np.linalg.norm(v, axis=1) ** 2).mean())


def test_good_fft_size():
    assert good_fft_size(36) == 36
    assert good_fft_size(37) == 40
    assert good_fft_size(129) == 135
    # 5-smooth only
    for n in (17, 97, 250, 1111):
        m = good_fft_size(n)
        assert m >= n
        for p in (2, 3, 5):
            while m % p == 0:
                m //= p
        assert m == 1


def test_mesh_shape_limits():
    sigma = jnp.float32(0.7)
    r = jnp.asarray([0.0, 1e-5, 0.1, 1.0, 5.0], jnp.float32)
    g = np.asarray(mesh_gphi_over_r(r, sigma))
    p = np.asarray(mesh_phi(r, sigma))
    assert np.isfinite(g).all() and np.isfinite(p).all()
    lim_g = np.sqrt(2 / np.pi) / (3 * 0.7**3)
    lim_p = -np.sqrt(2 / np.pi) / 0.7
    assert abs(g[0] - lim_g) < 1e-5 * lim_g
    assert abs(p[0] - lim_p) < 1e-5 * abs(lim_p)
    # far field -> Newtonian
    assert abs(g[-1] - 1 / 5.0**3) < 1e-6
    assert abs(p[-1] - (-1 / 5.0)) < 1e-6


def test_bh_oracle_matches_exact_class():
    """The C BH oracle at theta -> 0 must agree with the exact direct sum
    (they share kernels; the walk just never accepts a monopole)."""
    pos, h = _cloud(n=512)
    m = 1.0 / len(pos)
    ge, pe = exact_gravity(pos, h, m)
    gb, pb = bh_gravity(pos, h, m, theta=1e-9)
    np.testing.assert_allclose(gb, ge, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(pb, pe, rtol=1e-12)


def test_p3m_beats_reference_octree():
    """Full-engine P3M force error must be below the reference's
    theta = 0.576 monopole walk on the same particle set (measured against
    the same exact softened direct sum)."""
    n, kh = 4096, 32
    pos, h0 = _cloud(n=n, kh=kh)
    m = np.float32(1.0 / n)
    tile = choose_tile_params(pos, h0, kh)
    assert tile is not None

    jd = jnp.float32
    params = Params(
        m=m, gamma=jnp.asarray(5 / 3, jd), cs0=jnp.asarray(0.0, jd),
        alpha=jnp.asarray(1.0, jd), beta=jnp.asarray(2.0, jd),
        U0=jnp.asarray(0.0, jd), t_end=jnp.asarray(1e9, jd),
    )
    rng = np.random.default_rng(0)
    K = jnp.asarray(1.0 + 0.1 * rng.random(n), jd)
    P = jnp.asarray(pos)
    V = jnp.asarray(0.1 * rng.standard_normal((n, 3)), jd)
    H = jnp.asarray(h0)

    cfg_ex = EngineConfig(n=n, kh=kh, eos="polytropic", tile=tile)
    cfg_p3 = EngineConfig(
        n=n, kh=kh, eos="polytropic", tile=tile, gravity="p3m"
    )
    acc_e, red_e, phi_e, fb_e = jax.jit(
        lambda: force_eval(cfg_ex, params, P, V, K, H)
    )()
    acc_p, _, phi_p, fb_p = jax.jit(
        lambda: force_eval(cfg_p3, params, P, V, K, H)
    )()
    assert not bool(fb_e) and not bool(fb_p)

    # acc difference isolates the gravity difference (hydro is identical)
    dg = np.asarray(acc_p) - np.asarray(acc_e)
    ge, pe = exact_gravity(pos, np.asarray(red_e.h), float(m))
    gb, _ = bh_gravity(pos, np.asarray(red_e.h), float(m), theta=0.576)
    rms = _rms(ge)
    err_p3m = _rms(dg) / rms
    err_bh = _rms(gb - ge) / rms
    assert err_p3m < err_bh, (err_p3m, err_bh)
    assert err_p3m < 2e-3, err_p3m

    # phi: used only by the V diagnostic; hold it to the same bar here
    relp = np.abs(np.asarray(phi_p) - np.asarray(phi_e)) / np.abs(
        np.asarray(phi_e)
    )
    assert np.sqrt((relp**2).mean()) < 1e-3

    # mesh pair forces are antisymmetric: total momentum is preserved to
    # rounding, like the exact path
    assert np.abs(float(m) * dg.sum(0)).max() < 1e-5 * rms


def test_p3m_mesh_matches_analytic_shape():
    """Mesh-only output vs the analytic smoothed pair interaction it is
    deconvolved to represent (machinery error budget, ~1% at sigma=2.2)."""
    n = 2048
    pos, _ = _cloud(n=n)
    m = np.float32(1.0 / n)
    gm, sigc = 30, 2.2
    pad = good_fft_size(2 * (gm + 2))
    ghat = greens_hat(pad, sigc)
    g_mesh, phi_mesh = p3m_mesh_force(
        jnp.asarray(pos), m, ghat, gm=gm, pad=pad
    )
    half = float(np.abs(pos).max()) * (1 + 1e-6) + 1e-30
    sigma = np.float32(2 * half / gm * sigc)

    P = jnp.asarray(pos)

    @jax.jit
    def analytic():
        dx = P[:, None, :] - P[None, :, :]
        r = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
        gg = mesh_gphi_over_r(r, sigma)
        pp = mesh_phi(r, sigma)
        return m * jnp.sum(gg[..., None] * dx, axis=1), m * jnp.sum(pp, axis=1)

    g_an, p_an = analytic()
    g_an, p_an = np.asarray(g_an), np.asarray(p_an)
    assert _rms(np.asarray(g_mesh) - g_an) / _rms(g_an) < 2e-2
    rel = (np.asarray(phi_mesh) - p_an) / p_an
    assert np.sqrt((rel**2).mean()) < 1e-2


@pytest.mark.parametrize("eos", ["polytropic", "isothermal"])
def test_p3m_step_runs_both_eos(eos):
    """One full KDK step with p3m gravity stays finite for both EOS."""
    from sphtpu.engine import make_step
    from sphtpu.engine.config import State

    n, kh = 2048, 16
    pos, h0 = _cloud(n=n, kh=kh)
    tile = choose_tile_params(pos, h0, kh)
    cfg = EngineConfig(n=n, kh=kh, eos=eos, tile=tile, gravity="p3m")
    jd = jnp.float32
    rng = np.random.default_rng(1)
    params = Params(
        m=jnp.asarray(1.0 / n, jd), gamma=jnp.asarray(5 / 3, jd),
        cs0=jnp.asarray(0.5, jd), alpha=jnp.asarray(1.0, jd),
        beta=jnp.asarray(2.0, jd), U0=jnp.asarray(0.0, jd),
        t_end=jnp.asarray(1e9, jd),
    )
    state = State(
        pos=jnp.asarray(pos),
        vel=jnp.asarray(0.1 * rng.standard_normal((n, 3)), jd),
        K=jnp.asarray(1.0 + 0.1 * rng.random(n), jd),
        t=jnp.asarray(0.0, jd),
    )
    step = make_step(cfg)
    s2, stats, h2, rho2, nfb = jax.jit(step)(state, params, jnp.asarray(h0))
    assert int(nfb) == 0
    assert np.isfinite(np.asarray(s2.pos)).all()
    assert np.isfinite(np.asarray(stats)).all()
