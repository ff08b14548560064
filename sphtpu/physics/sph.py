"""SPH hydrodynamics: density, EOS, artificial viscosity, pair forces.

One parameterized engine covering both of the reference's near-duplicate
hydro files (polytrope_hydroKDTree.jl / isothermal_hydroKDTree.jl) — the
EOS is a config string, not a file fork. Semantics mirrored exactly:

- kNN neighbor lists of size Kh including self; h = (distance to the
  farthest of the Kh)/2 (polytrope_hydroKDTree.jl:151)
- density includes the self term (getDensity, :166-178)
- artificial viscosity mu = min(h_avg v.r / (r^2 + 0.01 h_avg^2), 0),
  Pi = (-alpha cs_i mu + beta mu^2)/rho_avg (:181-204); the polytrope path
  uses the *row* particle's sound speed (cs broadcast over rows), the
  isothermal path the global scalar cs
- pair force coefficients (hydroCalculation):
    polytropic: ct = m ((P_i/rho_i^2 + P_j/rho_j^2) + Pi_ij)/2   (:235)
    isothermal: ct = m (P_i/rho_i^2 + Pi_ij/2)                   (isothermal_hydroKDTree.jl:232)
  scattered symmetrically: a_i -= ct dW_ij, a_j += ct dW_ij, self pair
  skipped (:229-245)
- entropy evolution dK/dt from viscous heating (evolve_K!, :296-341)

Separations are recomputed exactly from gathered positions (the matmul-form
kNN distances lose float32 precision to cancellation).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..kernels import W, grad_W_over_r
from ..neighbors import knn


class SphForces(NamedTuple):
    acc: jnp.ndarray  # (N, 3) hydro-only acceleration
    rho: jnp.ndarray  # (N,)
    h: jnp.ndarray  # (N,)
    cs: jnp.ndarray  # (N,) sound speed (broadcast scalar for isothermal)
    # reduced per-particle quantities (all the step loop actually needs;
    # unused (N, K) fields are DCE'd under jit)
    mu_max: jnp.ndarray  # (N,) max_j mu_ij, for the dt criterion
    div_sum: jnp.ndarray  # (N,) sum_j m v_ij . dW_ij (m * divergence term)
    visc_dk: jnp.ndarray  # (N,) viscous-heating pair sum for evolve_K
    mu: jnp.ndarray  # (N, K) AV mu_ij
    Pi: jnp.ndarray  # (N, K) AV Pi_ij
    v_dot_dW: jnp.ndarray  # (N, K) v_ij . grad W_ij
    idx: jnp.ndarray  # (N, K) neighbor indices (self included)
    self_mask: jnp.ndarray  # (N, K) True where idx == own row


def sph_forces(
    pos: jnp.ndarray,
    vel: jnp.ndarray,
    m: jnp.ndarray,
    K: Optional[jnp.ndarray],
    *,
    eos: str,
    gamma: float,
    cs0,
    alpha,
    beta,
    kh: int,
) -> SphForces:
    """Full hydro force evaluation (HJL.hydrodynamics equivalent,
    polytrope_hydroKDTree.jl:251-292)."""
    n = pos.shape[0]
    idx, _ = knn(pos, pos, kh)
    # planar (N, K) separation planes: (N, K, 3)-trailing layouts lane-pad
    # 3 -> 128 on TPU
    dx = pos[:, 0:1] - pos[:, 0][idx]
    dy = pos[:, 1:2] - pos[:, 1][idx]
    dz = pos[:, 2:3] - pos[:, 2][idx]
    r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    h = jnp.max(r, axis=1) / 2.0
    hcol = h[:, None]
    q = r / hcol

    w = W(q, hcol)
    rho = m * jnp.sum(w, axis=1)

    if eos == "polytropic":
        cs = jnp.sqrt(gamma * K * rho ** (gamma - 1.0))
        P = K * rho**gamma
    elif eos == "isothermal":
        cs = jnp.broadcast_to(jnp.asarray(cs0, pos.dtype), rho.shape)
        P = cs0**2 * rho
    else:
        raise ValueError(f"unknown EOS {eos!r}")

    h_avg = 0.5 * (hcol + h[idx])
    rho_avg = 0.5 * (rho[:, None] + rho[idx])
    vij_x = vel[:, 0:1] - vel[:, 0][idx]
    vij_y = vel[:, 1:2] - vel[:, 1][idx]
    vij_z = vel[:, 2:3] - vel[:, 2][idx]
    v_dot_r = vij_x * dx + vij_y * dy + vij_z * dz
    mu = jnp.minimum(h_avg * v_dot_r / (r * r + 0.01 * h_avg**2), 0.0)
    Pi = (-alpha * cs[:, None] * mu + beta * mu**2) / rho_avg

    dWdr = grad_W_over_r(q, r, hcol)

    p_over_rho2 = P / rho**2
    if eos == "polytropic":
        ct = m * (p_over_rho2[:, None] + p_over_rho2[idx] + Pi) / 2.0
    else:
        ct = m * (p_over_rho2[:, None] + Pi / 2.0)

    self_mask = idx == jnp.arange(n, dtype=idx.dtype)[:, None]
    ct = jnp.where(self_mask, 0.0, ct)

    flat_idx = idx.reshape(-1)
    coeff = ct * dWdr
    acc_axes = []
    for dax in (dx, dy, dz):
        contrib = coeff * dax
        a = -jnp.sum(contrib, axis=1)
        acc_axes.append(a.at[flat_idx].add(contrib.reshape(-1)))
    acc = jnp.stack(acc_axes, axis=1)

    v_dot_dW = v_dot_r * dWdr

    # reductions consumed by the step loop (adaptive dt + evolve_K)
    mu_max = jnp.max(mu, axis=1)
    div_sum = jnp.sum(m * v_dot_dW, axis=1)
    ct_k = jnp.where(self_mask, 0.0, m * Pi * v_dot_dW / 2.0)
    visc_dk = jnp.sum(ct_k, axis=1)
    visc_dk = visc_dk.at[flat_idx].add(ct_k.reshape(-1))

    return SphForces(
        acc, rho, h, cs, mu_max, div_sum, visc_dk, mu, Pi, v_dot_dW, idx,
        self_mask,
    )


def evolve_K(
    Kv: jnp.ndarray,
    visc_dk: jnp.ndarray,
    gamma,
    rho: jnp.ndarray,
    dt,
) -> jnp.ndarray:
    """Half-step entropy update from viscous heating (evolve_K!,
    polytrope_hydroKDTree.jl:296-341). visc_dk is the symmetrized pair sum
    sum_j m Pi_ij (v_ij . dW_ij)/2 accumulated to both pair members, as
    returned by the force evaluation. Note the reference multiplies by dt/2
    internally and is called once per half step."""
    return Kv + (0.5 * (gamma - 1.0) / rho ** (gamma - 1.0) * visc_dk) * (
        dt / 2.0
    )
