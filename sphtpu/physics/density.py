"""SPH density sampled at arbitrary points (the radial-profile probe).

Equivalent of HJL.density_plot (polytrope_hydroKDTree.jl:344-350): kNN of M
sample points against the particle set, h = (distance to the Kh-th
neighbor)/2, cubic-spline weight sum. Runs on device in code units.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..kernels import W
from ..neighbors import knn


@functools.partial(jax.jit, static_argnames=("kh",))
def density_at(rr: jnp.ndarray, pos: jnp.ndarray, m, kh: int) -> jnp.ndarray:
    idx, _ = knn(rr, pos, kh)
    d = rr[:, None, :] - pos[idx]
    r = jnp.sqrt(jnp.sum(d * d, axis=-1))
    h = jnp.max(r, axis=1) / 2.0
    q = r / h[:, None]
    w = W(q, h[:, None])
    return m * jnp.sum(w, axis=1)
