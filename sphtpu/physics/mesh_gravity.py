"""P3M far-field gravity: FFT particle-mesh + exact in-tile pair correction.

The reference resolves far-field gravity with a per-particle Barnes-Hut
octree walk (gravOctree_Single.jl:239-278, dual opening criterion at :265,
monopole nodes, theta = 0.576). Data-dependent tree walks are TPU-hostile;
the TPU-native far field here is the particle-particle/particle-mesh
split (Hockney & Eastwood):

  total = mesh(smoothed, all pairs, via FFT) + near(exact - mesh_shape)

*   Every particle's mass is Gaussian-smoothed (width sigma = one mesh
    cell) and deposited on a mesh with CIC weights; one forward real FFT,
    a multiply with the precomputed isolated-boundary Green's function,
    and spectral-gradient inverse FFTs give the smoothed potential and
    force fields, interpolated back with the same CIC weights. FFTs are
    dense batched matmul-class work — exactly what the MXU/XLA do well —
    and the cost is O(Gm^3 log Gm), independent of clustering.
*   The smoothed field differs from the exact softened interaction only
    within a few sigma. The mesh spans mesh_factor cells per tile cell, so
    every pair closer than one tile-cell edge s = mesh_factor * sigma is
    inside the masked cell-tile engine's 27-cell block
    (physics/tiles.py), where the pair sweep adds the analytic correction
    (softened_exact(r; h_avg) - mesh_shape(r; sigma)) per pair. Beyond s
    the residual is the Gaussian tail, ~1e-5 relative at mesh_factor = 5.
*   Isolated (non-periodic) boundaries use the Hockney-Eastwood doubled
    grid: the Green's function is sampled in real space on a >= 2x padded
    grid (in cell units, so it depends only on the static padded size, not
    on the evolving domain scale) and FFT'd once per config on the host.
*   Momentum conservation is exact: deposit and interpolation share the
    CIC window and the spectral-gradient force kernel is exactly
    antisymmetric, so the mesh pair force is antisymmetric and the
    self-force vanishes identically.

Accuracy is measured, not assumed: tests/test_mesh_gravity.py compares the
RMS force error of this P3M against an exact all-pairs oracle AND against
a C implementation of the reference's own octree criterion
(tests/bh_oracle.c), asserting P3M matches or beats the reference's
theta = 0.576 monopole walk.

All quantities are code units, per unit G (the engine applies acc -= G g,
polytrope_sim.jl:43-45). Returned (g, phi) include the particle mass m.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.special import erf


def good_fft_size(n: int) -> int:
    """Smallest 5-smooth integer >= n (XLA FFTs like {2,3,5} factors)."""
    best = None
    p2 = 1
    while p2 < 8 * n:
        p3 = p2
        while p3 < 8 * n:
            p5 = p3
            while p5 < n:
                p5 *= 5
            if best is None or p5 < best:
                best = p5
            p3 *= 3
        p2 *= 2
    return best


def _domain_half(pos: jnp.ndarray) -> jnp.ndarray:
    """Half-edge of the particle bounding cube; MUST stay bit-identical to
    the tile engine's grid sizing (physics/tiles.py) so sigma = s/mesh_factor
    holds exactly between the mesh and the in-tile pair correction."""
    return jnp.max(jnp.abs(pos)) * (1.0 + 1e-6) + jnp.asarray(1e-30, pos.dtype)


# ---------------------------------------------------------------------------
# Green's function (pure jnp: computed once per chunk, outside the scan)
# ---------------------------------------------------------------------------


def greens_hat(pad: int, sigma_cells: float, dtype=jnp.float32) -> jnp.ndarray:
    """rfftn of the isolated-BC smoothed potential kernel, in mesh-cell
    units: K_phi(r) = -erf(r / (sqrt2 sigma)) / r, K_phi(0) = -sqrt(2/pi)/sigma,
    sampled with minimum-image displacements on the padded grid, with the
    CIC window deconvolved twice (deposit + interpolation): the raw mesh
    pair interaction is K (x) W (x) W; dividing by What^2 = prod
    sinc^4(k_i/2) restores the analytic erf shape the in-tile correction
    subtracts (Hockney & Eastwood ch. 8). Physical scaling is the single
    factor 1/a applied at use (a = mesh cell edge), so this depends only on
    the static (pad, sigma_cells) — call it outside the step scan and XLA
    computes it once per chunk."""
    ax = jnp.arange(pad)
    ax = jnp.where(ax <= pad // 2, ax, ax - pad).astype(dtype)
    r = jnp.sqrt(
        ax[:, None, None] ** 2 + ax[None, :, None] ** 2 + ax[None, None, :] ** 2
    )
    r_safe = jnp.where(r > 0, r, 1.0)
    k = jnp.where(
        r > 0,
        -erf(r / (jnp.sqrt(jnp.asarray(2.0, dtype)) * sigma_cells)) / r_safe,
        -jnp.sqrt(jnp.asarray(2.0 / jnp.pi, dtype)) / sigma_cells,
    )
    khat = jnp.fft.rfftn(k)

    kf = (2.0 * jnp.pi) * jnp.fft.fftfreq(pad).astype(dtype)
    krf = (2.0 * jnp.pi) * jnp.fft.rfftfreq(pad).astype(dtype)

    def sinc2(kk):
        x = kk / 2.0
        x_safe = jnp.where(x != 0, x, 1.0)
        return jnp.where(x != 0, (jnp.sin(x_safe) / x_safe) ** 2, 1.0)

    w2 = (
        sinc2(kf)[:, None, None]
        * sinc2(kf)[None, :, None]
        * sinc2(krf)[None, None, :]
    )
    return khat / (w2 * w2)


# ---------------------------------------------------------------------------
# Analytic mesh-shape pair terms (the in-tile correction subtracts these)
# ---------------------------------------------------------------------------


def mesh_gphi_over_r(r: jnp.ndarray, sigma) -> jnp.ndarray:
    """d(phi_mesh)/dr / r for the Gaussian-smoothed pair interaction
    phi_mesh(r) = -erf(r/(sqrt2 sigma))/r, safe at r = 0 (finite limit
    sqrt(2/pi)/(3 sigma^3))."""
    t = r / sigma
    r_safe = jnp.where(r > 0, r, sigma)
    core = erf(t / jnp.sqrt(jnp.asarray(2.0, r.dtype))) - jnp.sqrt(
        jnp.asarray(2.0 / jnp.pi, r.dtype)
    ) * t * jnp.exp(-0.5 * t * t)
    val = core / r_safe**3
    # series limit for tiny r (cancellation kills the closed form there)
    lim = jnp.sqrt(jnp.asarray(2.0 / jnp.pi, r.dtype)) / (3.0 * sigma**3)
    return jnp.where(t > 1e-2, val, lim)


def mesh_phi(r: jnp.ndarray, sigma) -> jnp.ndarray:
    """phi_mesh(r) = -erf(r/(sqrt2 sigma))/r, safe at r = 0 (limit
    -sqrt(2/pi)/sigma)."""
    t = r / sigma
    r_safe = jnp.where(r > 0, r, sigma)
    val = -erf(t / jnp.sqrt(jnp.asarray(2.0, r.dtype))) / r_safe
    lim = -jnp.sqrt(jnp.asarray(2.0 / jnp.pi, r.dtype)) / sigma
    return jnp.where(t > 1e-2, val, lim)


# degree-8 fit of erfcx(z) = erfc(z) exp(z^2) in u = z/(1+z), z in [0, 9]
# (max abs err 4.7e-6); lets the hot tail-correction pass below evaluate
# erfc-class kernels with one exp + one divide + a short Horner chain
# instead of erf + exp + divides per pair
_ERFCX_COEFFS = (
    2.3849380332e-01, -9.3397713762e-01, 1.2579923862e+00,
    -8.1740263321e-01, 4.6001262975e-01, 4.3301822784e-02,
    -1.1974394197e-01, -1.1287916483e+00, 1.0000047021e+00,
)


def newton_minus_mesh(d2: jnp.ndarray, inv_r: jnp.ndarray, sigma):
    """(gphi_over_r, phi) of the SHORT-RANGE complement (Newtonian minus
    mesh shape), the radial h-free tail the tile engine's correction pass
    adds on top of the mesh:

      gphi/r = [erfc(z) + sqrt(2/pi) t exp(-t^2/2)] / r^3
      phi    = -erfc(z)/r                      (z = t/sqrt2, t = r/sigma)

    Evaluated as exp(-z^2) * erfcx-poly — one exp, no erf. Decays like
    exp(-t^2/2): ~1e-4 relative at t = 4.4 (the 5^3-block guarantee with
    sigma_cells = 2.2, mesh_factor = 5). inv_r must be rsqrt(d2) with
    d2 > 0 masked by the caller; at the self slot (d2 = 0) the returned
    phi is +sqrt(2/pi)/sigma (the Newtonian self term is excluded while
    the mesh's smoothed self-interaction must still be cancelled) and the
    force term is zero.
    """
    dtype = d2.dtype
    t = d2 * inv_r / sigma
    z = t * jnp.asarray(0.7071067811865476, dtype)
    u = z / (1.0 + z)
    p = jnp.asarray(_ERFCX_COEFFS[0], dtype)
    for c in _ERFCX_COEFFS[1:]:
        p = p * u + jnp.asarray(c, dtype)
    e = jnp.exp(-z * z)
    erfc_z = e * p
    f = erfc_z + jnp.asarray(0.7978845608028654, dtype) * t * e
    inv_r3 = inv_r * inv_r * inv_r
    gphi_over_r = jnp.where(d2 > 0, f * inv_r3, 0.0)
    phi = jnp.where(
        d2 > 0,
        -erfc_z * inv_r,
        jnp.asarray(0.7978845608028654, dtype) / sigma,
    )
    return gphi_over_r, phi


# ---------------------------------------------------------------------------
# Mesh solve
# ---------------------------------------------------------------------------


def _cic(pos: jnp.ndarray, half, a, pad: int):
    """CIC cell indices and weights: (idx (N,8) flat int32 into the padded
    pad^3 grid, w (N,8)). Mesh cell centers sit at (i+0.5-1) a - half (one
    ghost cell of offset keeps all 8 deposit corners in-range without
    wrapping)."""
    u = (pos + half) / a - 0.5 + 1.0  # +1: ghost-cell offset
    i0 = jnp.floor(u).astype(jnp.int32)
    f = (u - i0).astype(pos.dtype)
    idx_list = []
    w_list = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                iz = i0[:, 2] + dz
                iy = i0[:, 1] + dy
                ix = i0[:, 0] + dx
                idx_list.append((iz * pad + iy) * pad + ix)
                wz = f[:, 2] if dz else 1.0 - f[:, 2]
                wy = f[:, 1] if dy else 1.0 - f[:, 1]
                wx = f[:, 0] if dx else 1.0 - f[:, 0]
                w_list.append(wz * wy * wx)
    return jnp.stack(idx_list, axis=1), jnp.stack(w_list, axis=1)


@functools.partial(jax.jit, static_argnames=("gm", "pad"))
def p3m_mesh_force(
    pos: jnp.ndarray,
    m,
    greens_hat: jnp.ndarray,
    *,
    gm: int,
    pad: int,
):
    """Smoothed-interaction (g, phi) at every particle from the mesh.

    gm: live mesh cells per edge (mesh_factor * tile grid); pad: padded FFT
    edge (>= 2*(gm+2), from good_fft_size). greens_hat: rfftn of the
    cell-unit kernel (greens_hat_np(pad, sigma_cells)). Self-interaction is
    included (the in-tile correction subtracts its analytic value).
    Returns g (N,3) with g_i = grad phi_mesh(x_i), phi (N,), both including
    the source mass m (per unit G)."""
    n = pos.shape[0]
    dtype = pos.dtype
    half = _domain_half(pos)
    a = 2.0 * half / gm

    idx, w = _cic(pos, half, a, pad)
    rho = jnp.zeros((pad * pad * pad,), dtype).at[idx.reshape(-1)].add(
        (m * w).reshape(-1)
    )
    rho_hat = jnp.fft.rfftn(rho.reshape(pad, pad, pad))
    phi_hat = rho_hat * greens_hat  # cell-unit kernel; 1/a applied below

    # spectral gradient: k in cell units (the extra 1/a folds into scale)
    kfreq = (2.0 * jnp.pi) * jnp.fft.fftfreq(pad).astype(dtype)
    krfreq = (2.0 * jnp.pi) * jnp.fft.rfftfreq(pad).astype(dtype)
    kz = kfreq[:, None, None]
    ky = kfreq[None, :, None]
    kx = krfreq[None, None, :]

    phi_grid = jnp.fft.irfftn(phi_hat, s=(pad, pad, pad)).reshape(-1)
    gx_grid = jnp.fft.irfftn(1j * kx * phi_hat, s=(pad, pad, pad)).reshape(-1)
    gy_grid = jnp.fft.irfftn(1j * ky * phi_hat, s=(pad, pad, pad)).reshape(-1)
    gz_grid = jnp.fft.irfftn(1j * kz * phi_hat, s=(pad, pad, pad)).reshape(-1)

    def interp(grid):
        return jnp.sum(grid[idx] * w, axis=1)

    inv_a = 1.0 / a
    phi = interp(phi_grid) * inv_a
    g = jnp.stack(
        [interp(gx_grid), interp(gy_grid), interp(gz_grid)], axis=1
    ) * (inv_a * inv_a)
    return g.astype(dtype), phi.astype(dtype)
