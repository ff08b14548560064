"""Cubic-spline SPH kernel W and its gradient, as branchless jnp.

The reference evaluates these with per-row boolean masks and Julia loops
(polytrope_hydroKDTree.jl:5-73). On TPU the piecewise polynomial is a pair
of jnp.where selects on the VPU, fused by XLA into whatever consumes it.

Normalization (3D): W(r, h) = 1/(pi h^3) * { 1 - 3/2 q^2 + 3/4 q^3   q <= 1
                                              1/4 (2 - q)^3           1 < q <= 2
                                              0                       q > 2 }
with q = r/h. The reference's polytrope path writes mask2 = !mask1
(no q<=2 upper bound, polytrope_hydroKDTree.jl:158) but q <= 2 always holds
there by construction (h = r_kmax/2), so the explicit q<=2 form used here is
equivalent on the kNN path and also correct for dense/all-pairs use
(baseline adiabatic_forces.jl:239-241 has the 3-zone form).
"""

from __future__ import annotations

import jax.numpy as jnp


def W(q: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Kernel value. q: (..., K) ratios r/h; h broadcastable against q
    (typically (..., 1))."""
    ct = 1.0 / (jnp.pi * h**3)
    w1 = 1.0 - 1.5 * q**2 + 0.75 * q**3
    w2 = 0.25 * (2.0 - q) ** 3
    return ct * jnp.where(q <= 1.0, w1, jnp.where(q <= 2.0, w2, 0.0))


def grad_W_over_r(q: jnp.ndarray, r: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """(dW/dr)/r, so grad W = result * (dx, dy, dz).

    Matches gradW (polytrope_hydroKDTree.jl:38-73): the q<=1 branch is the
    polynomial ct*(9/4 r/h^2 - 3/h) which is finite at r=0 (no division), so
    self-pairs contribute exactly zero gradient; the outer branch divides by
    r and is guarded against r=0.
    """
    ct = 1.0 / (jnp.pi * h**4)
    g1 = ct * (2.25 * r / h**2 - 3.0 / h)
    r_safe = jnp.where(r > 0.0, r, 1.0)
    g2 = ct * (-0.75 * (2.0 - q) ** 2) / r_safe
    return jnp.where(q <= 1.0, g1, jnp.where(q <= 2.0, g2, 0.0))
