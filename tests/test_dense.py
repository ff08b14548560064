import jax.numpy as jnp
import numpy as np
import pytest

from sphtpu.physics import gravity_allpairs, sph_forces
from sphtpu.physics.dense import dense_forces


def test_dense_matches_knn_engine_at_full_k():
    """With kh == N and no artificial viscosity, the neighbor-list engine
    and the dense antisymmetrized engine are the same math (the
    baseline<->fastv1 oracle relation, SURVEY.md §4). With AV on, the two
    generations genuinely differ in the reference too: the dense form
    applies Pi computed with cs_i to both pair halves (baseline Acc uses
    ct_h .* (dW - dW')/2) while the fastv1 scatter uses each row's own
    sound speed — so the AV-free regime is where agreement is exact."""
    rng = np.random.default_rng(0)
    n = 96
    pos = jnp.asarray(rng.standard_normal((n, 3)))
    vel = jnp.asarray(0.2 * rng.standard_normal((n, 3)))
    K = jnp.asarray(1.0 + rng.random(n))
    kw = dict(eos="polytropic", gamma=5 / 3, cs0=0.0, alpha=0.0, beta=0.0, kh=n)
    m = 1.0 / n

    fast = sph_forces(pos, vel, m, K, **kw)
    dense, phi = dense_forces(pos, vel, m, K, **kw, G=1.0)

    np.testing.assert_allclose(np.asarray(dense.rho), np.asarray(fast.rho), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(dense.h), np.asarray(fast.h), rtol=1e-12)
    g, phi_ref = gravity_allpairs(pos, fast.h, m)
    np.testing.assert_allclose(
        np.asarray(dense.acc), np.asarray(fast.acc - g), rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(phi), np.asarray(phi_ref), rtol=1e-10)


def test_dense_momentum_conservation():
    """Pressure + gravity conserve momentum exactly; the AV term with
    per-row cs (faithful to baseline Acc) breaks exact antisymmetry, so the
    strict check runs with alpha=beta=0."""
    rng = np.random.default_rng(1)
    n = 128
    pos = jnp.asarray(rng.standard_normal((n, 3)))
    vel = jnp.asarray(0.2 * rng.standard_normal((n, 3)))
    K = jnp.asarray(np.ones(n))
    dense, _ = dense_forces(
        pos, vel, 1.0 / n, K, eos="polytropic", gamma=5 / 3, cs0=0.0,
        alpha=0.0, beta=0.0, kh=32, G=1.0,
    )
    assert np.abs(np.asarray(dense.acc).sum(axis=0)).max() < 1e-12
