"""Pallas phase-A kernel vs the XLA tile formulation (interpret mode on
CPU, like tests/test_pallas_gravity.py)."""

import numpy as np

from sphtpu.physics.tiles import choose_tile_params, tile_sph_forces


def _setup(n=3000, kh=24, seed=5):
    import jax.numpy as jnp
    from scipy.spatial import cKDTree

    from sphtpu.scenes.generators import boss_bodenheimer

    rng = np.random.default_rng(seed)
    pos, _, _ = boss_bodenheimer(n, 1.0, 1.0, rng=rng)
    pos = pos.astype(np.float32)
    vel = (0.1 * rng.standard_normal((n, 3))).astype(np.float32)
    d, _ = cKDTree(pos).query(pos, k=kh)
    h0 = (d[:, -1] / 2).astype(np.float32)
    tile = choose_tile_params(pos, h0, kh)
    assert tile is not None
    K = (1.0 + 0.1 * rng.random(n)).astype(np.float32)
    return (
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(K),
        jnp.asarray(h0), tile,
    )


def test_phase_a_pallas_matches_xla():
    pos, vel, K, h0, (grid, cap) = _setup()
    kw = dict(
        eos="polytropic",
        gamma=np.float32(5 / 3), cs0=np.float32(0.0),
        alpha=np.float32(1.0), beta=np.float32(2.0),
        kh=24, grid=grid, cap=cap,
    )
    m = np.float32(1.0 / pos.shape[0])
    ref, gref, ok_ref = tile_sph_forces(pos, vel, m, K, h0, **kw)
    out, gout, ok_out = tile_sph_forces(
        pos, vel, m, K, h0, pallas_a=True, pallas_interpret=True, **kw
    )
    assert bool(ok_ref) and bool(ok_out)
    # identical selection (same k-th neighbor set) => h matches to the ulp
    # of the shared sqrt; density and everything downstream to f32 tol
    np.testing.assert_allclose(np.asarray(out.h), np.asarray(ref.h),
                               rtol=2e-7, atol=0)
    np.testing.assert_allclose(np.asarray(out.rho), np.asarray(ref.rho),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.acc), np.asarray(ref.acc),
                               rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gout[3]), np.asarray(gref[3]),
                               rtol=1e-4, atol=1e-8)


def test_phase_a_pallas_flags_undersized_grid():
    """A grid too coarse for kh certification must report ok=False through
    the pallas path as well."""
    import jax.numpy as jnp

    pos, vel, K, h0, (grid, cap) = _setup(n=800, kh=24)
    # force a much finer grid than certification allows: r_k > cell edge
    bad_grid = grid * 4
    kw = dict(
        eos="polytropic",
        gamma=np.float32(5 / 3), cs0=np.float32(0.0),
        alpha=np.float32(1.0), beta=np.float32(2.0),
        kh=24, grid=bad_grid, cap=cap,
    )
    m = np.float32(1.0 / pos.shape[0])
    _, _, ok = tile_sph_forces(
        pos, vel, m, K, jnp.zeros_like(h0),
        pallas_a=True, pallas_interpret=True, **kw
    )
    assert not bool(ok)
