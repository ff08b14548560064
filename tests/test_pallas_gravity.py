import jax.numpy as jnp
import numpy as np

from sphtpu.kernels.pallas_gravity import newton_sweep_pallas
from sphtpu.physics import gravity_newton_allpairs


def test_pallas_newton_matches_xla():
    rng = np.random.default_rng(0)
    n = 900  # deliberately not a multiple of the row tile
    pos = jnp.asarray(rng.standard_normal((n, 3)))
    m = 1.0 / n
    g1, p1 = gravity_newton_allpairs(pos, m)
    g2, p2 = newton_sweep_pallas(pos, m, interpret=True)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), rtol=1e-10)
    # Newton's third law
    assert np.abs(np.asarray(g2).sum(axis=0)).max() < 1e-10
