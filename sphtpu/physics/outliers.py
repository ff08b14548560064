"""The outlier lane: exact handling for large-h particles that do not fit
the mono-level tile certification (h <= cell/2).

During gravitational collapse the smoothing-length distribution stretches:
the dense core wants a fine grid while the diffuse envelope's h stays
large. Round 1's mono-level grid sized cells from max(h), so a collapsing
core blew past the slot capacity and the whole evaluation fell back to the
gather engine (a ~30x cliff). Here the grid is sized from the BULK of the
h distribution instead, and the few large-h "outlier" rows (selected by
h_hint * OUTLIER_CUT > cell edge) take an exact O(B*N) lane:

  - pass 1: blocked exact kNN over all particles -> h, rho (the same
    semantics as the gather engine, polytrope_hydroKDTree.jl:118-178)
  - pass 2: the reference's symmetric pair scatter for outlier rows
    (hydroCalculation, :222-248): the row accumulates -ct dW(h_row) over
    its kNN and scatters +ct dW(h_row) to each neighbor; the tile engine
    excludes outlier SOURCES from its reverse mask so each pair is counted
    exactly once
  - gravity sweeps: softened-vs-Newtonian corrections for pairs involving
    an outlier beyond the tile stencil (cell distance > 1), where the
    in-tile term-1 correction cannot reach (2 h_avg > cell edge is only
    possible when one member is an outlier)

Everything here is exact, so outliers never cost correctness — only B*N
work, which the driver budgets (physics/tiles.py certifies n_out <= B and
falls back otherwise).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..kernels import W, grad_W_over_r, softened_gphi_over_r, softened_phi
from ..neighbors import knn

# species cut: rows with h_hint * OUTLIER_CUT > cell edge take the outlier
# lane. 2.0 is the certification bound (h <= s/2); the 7% margin keeps
# h drift within a chunk from flipping certified rows into failures.
OUTLIER_CUT = 2.0 * 1.07


def outlier_knn(pos, out_rows, m, kh: int):
    """Exact kNN density pass for the outlier rows.

    out_rows: (B,) global row indices (>= N marks padding). Returns
    (idx (B, kh) neighbor indices, h (B,), rho (B,)) — values at padded
    rows are harmless garbage the caller masks."""
    n = pos.shape[0]
    safe = jnp.minimum(out_rows, n - 1)
    q = pos[safe]
    idx, _ = knn(q, pos, kh)
    dx = q[:, 0:1] - pos[:, 0][idx]
    dy = q[:, 1:2] - pos[:, 1][idx]
    dz = q[:, 2:3] - pos[:, 2][idx]
    r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    h = jnp.max(r, axis=1) / 2.0
    hcol = h[:, None]
    rho = m * jnp.sum(W(r / hcol, hcol), axis=1)
    return idx, h, rho


def outlier_forces(
    pos, vel, out_rows, idx, h_all, rho_all, por2_all, cs_all, m,
    *, eos: str, alpha, beta,
):
    """Pair forces for outlier rows with the reference's symmetric scatter.

    h_all/rho_all/por2_all/cs_all: merged per-particle fields (tile values
    with outlier rows overwritten by the kNN pass). Returns
    (row = dict(acc, mu_max, div_sum, visc_dk) over the B rows,
     scat = dict(ax, ay, az, visc) (N,) buffers to add to every particle).
    Padded rows (out_rows >= N) contribute nothing."""
    n = pos.shape[0]
    b, kh = idx.shape
    dtype = pos.dtype
    safe = jnp.minimum(out_rows, n - 1)
    row_valid = (out_rows < n)[:, None]

    q = pos[safe]
    qv = vel[safe]
    h_c = h_all[safe][:, None]
    rho_c = rho_all[safe][:, None]
    por2_c = por2_all[safe][:, None]
    cs_c = cs_all[safe][:, None]

    dx = q[:, 0:1] - pos[:, 0][idx]
    dy = q[:, 1:2] - pos[:, 1][idx]
    dz = q[:, 2:3] - pos[:, 2][idx]
    r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    h_avg = 0.5 * (h_c + h_all[idx])
    rho_avg = 0.5 * (rho_c + rho_all[idx])
    vij_x = qv[:, 0:1] - vel[:, 0][idx]
    vij_y = qv[:, 1:2] - vel[:, 1][idx]
    vij_z = qv[:, 2:3] - vel[:, 2][idx]
    v_dot_r = vij_x * dx + vij_y * dy + vij_z * dz
    mu = jnp.minimum(h_avg * v_dot_r / (r * r + 0.01 * h_avg**2), 0.0)
    Pi = (-alpha * cs_c * mu + beta * mu**2) / rho_avg

    dWdr = grad_W_over_r(r / h_c, r, h_c)
    if eos == "polytropic":
        ct = m * (por2_c + por2_all[idx] + Pi) / 2.0
    else:
        ct = m * (por2_c + Pi / 2.0)
    self_mask = idx == out_rows[:, None]
    ct = jnp.where(self_mask | ~row_valid, 0.0, ct)

    coeff = ct * dWdr
    flat_idx = jnp.where(row_valid, idx, n).reshape(-1)  # pad -> dropped
    scat = {}
    accs = []
    for name, dax in (("ax", dx), ("ay", dy), ("az", dz)):
        contrib = coeff * dax
        accs.append(-jnp.sum(contrib, axis=1))
        scat[name] = jnp.zeros((n,), dtype).at[flat_idx].add(
            contrib.reshape(-1), mode="drop"
        )
    v_dot_dW = v_dot_r * dWdr
    ct_k = jnp.where(self_mask | ~row_valid, 0.0, m * Pi * v_dot_dW / 2.0)
    scat["visc"] = jnp.zeros((n,), dtype).at[flat_idx].add(
        ct_k.reshape(-1), mode="drop"
    )
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    row = dict(
        acc=jnp.stack(accs, axis=1),
        mu_max=jnp.max(jnp.where(row_valid, mu, -big), axis=1),
        div_sum=jnp.sum(jnp.where(row_valid, m * v_dot_dW, 0.0), axis=1),
        visc_dk=jnp.sum(ct_k, axis=1),
    )
    return row, scat


def _cells(pos, half, s, g):
    """Tile-grid cell coordinates, bit-identical to _bin_particles."""
    return jnp.clip(
        jnp.floor((pos + half) / s).astype(jnp.int32), 0, g - 1
    )


def outlier_gravity_corr(
    pos, h_all, out_rows, is_out, m, half, s, g: int,
    *, block: int = 1024,
):
    """(softened - Newtonian) corrections for pairs involving an outlier
    at cell distance > 1 (outside the tile engine's 27-cell term-1 pass).

    Sweep 1: every particle receives corrections from outlier sources.
    Sweep 2: outlier rows receive corrections from non-outlier sources
    (outlier-outlier pairs are fully covered by sweep 1). Returns
    (dg (N,3), dphi (N,)) to ADD to the gravity-correction accumulators.
    """
    n = pos.shape[0]
    b = out_rows.shape[0]
    dtype = pos.dtype
    safe = jnp.minimum(out_rows, n - 1)
    src_valid = out_rows < n

    cell_all = _cells(pos, half, s, g)
    cell_out = cell_all[safe]

    sx, sy, sz = pos[safe, 0], pos[safe, 1], pos[safe, 2]
    sh = h_all[safe]

    def far_mask(cq, cc):
        return (
            (jnp.abs(cq[..., 0:1] - cc[..., 0]) > 1)
            | (jnp.abs(cq[..., 1:2] - cc[..., 1]) > 1)
            | (jnp.abs(cq[..., 2:3] - cc[..., 2]) > 1)
        )

    def corr(dx, dy, dz, h_avg, mask):
        r2 = dx * dx + dy * dy + dz * dz
        r = jnp.sqrt(r2)
        r_safe = jnp.where(r2 > 0, r, 1.0)
        newt_g = jnp.where(r2 > 0, 1.0 / r_safe**3, 0.0)
        newt_p = jnp.where(r2 > 0, -1.0 / r_safe, 0.0)
        # beyond q = 2 softened == Newtonian exactly; the mask only trims
        # the 27-block overlap and padding
        cg = jnp.where(mask, softened_gphi_over_r(r, h_avg) - newt_g, 0.0)
        cp = jnp.where(mask, softened_phi(r, h_avg) - newt_p, 0.0)
        return cg, cp

    # ---- sweep 1: all N receivers x B outlier sources ----
    nb = -(-n // block) * block
    posp = jnp.pad(pos, ((0, nb - n), (0, 0)))
    hp = jnp.pad(h_all, (0, nb - n), constant_values=1.0)
    cellp = jnp.pad(cell_all, ((0, nb - n), (0, 0)), constant_values=-9)

    def recv_block(args):
        pq, hq, cq = args
        dx = pq[:, 0:1] - sx[None, :]
        dy = pq[:, 1:2] - sy[None, :]
        dz = pq[:, 2:3] - sz[None, :]
        h_avg = 0.5 * (hq[:, None] + sh[None, :])
        mask = src_valid[None, :] & far_mask(cq, cell_out[None, :, :])
        cg, cp = corr(dx, dy, dz, h_avg, mask)
        return (
            m * jnp.sum(cg * dx, axis=1),
            m * jnp.sum(cg * dy, axis=1),
            m * jnp.sum(cg * dz, axis=1),
            m * jnp.sum(cp, axis=1),
        )

    gx, gy, gz, gp = lax.map(
        recv_block,
        (
            posp.reshape(nb // block, block, 3),
            hp.reshape(nb // block, block),
            cellp.reshape(nb // block, block, 3),
        ),
        batch_size=4,
    )
    dg = jnp.stack(
        [gx.reshape(nb)[:n], gy.reshape(nb)[:n], gz.reshape(nb)[:n]], axis=1
    )
    dphi = gp.reshape(nb)[:n]

    # ---- sweep 2: B outlier receivers x all N non-outlier sources ----
    def out_block(args):
        pq, hq, cq, rv = args
        def col(cstart, carry):
            ax, ay, az, ap = carry
            px = lax.dynamic_slice(pos[:, 0], (cstart * block,), (block,))
            py = lax.dynamic_slice(pos[:, 1], (cstart * block,), (block,))
            pz = lax.dynamic_slice(pos[:, 2], (cstart * block,), (block,))
            hh = lax.dynamic_slice(h_all, (cstart * block,), (block,))
            cc = lax.dynamic_slice(cell_all, (cstart * block, 0), (block, 3))
            oo = lax.dynamic_slice(is_out, (cstart * block,), (block,))
            cid = cstart * block + lax.broadcasted_iota(
                jnp.int32, (1, block), 1
            )
            dx = pq[:, 0:1] - px[None, :]
            dy = pq[:, 1:2] - py[None, :]
            dz = pq[:, 2:3] - pz[None, :]
            h_avg = 0.5 * (hq[:, None] + hh[None, :])
            mask = (
                rv[:, None]
                & (cid < n)
                & ~oo[None, :]
                & far_mask(cq, cc[None, :, :])
            )
            cg, cp = corr(dx, dy, dz, h_avg, mask)
            return (
                ax + jnp.sum(cg * dx, axis=1),
                ay + jnp.sum(cg * dy, axis=1),
                az + jnp.sum(cg * dz, axis=1),
                ap + jnp.sum(cp, axis=1),
            )

        zero = jnp.zeros((pq.shape[0],), dtype)
        # pos may not be block-aligned: pad via the mask (cid < n)
        n_cols = -(-n // block)
        return lax.fori_loop(0, n_cols, col, (zero, zero, zero, zero))

    # pad sources so dynamic_slice stays in bounds
    # (re-pad pos/h/cells/is_out once; XLA reuses the padded buffers)
    pos = jnp.pad(pos, ((0, nb - n), (0, 0)))
    h_all = jnp.pad(h_all, (0, nb - n), constant_values=1.0)
    cell_all = jnp.pad(cell_all, ((0, nb - n), (0, 0)), constant_values=-9)
    is_out = jnp.pad(is_out, (0, nb - n))

    bx, by, bz, bp = out_block(
        (pos[safe], h_all[safe], cell_all[safe], src_valid)
    )
    dg = dg.at[safe].add(
        m
        * jnp.where(
            src_valid[:, None], jnp.stack([bx, by, bz], axis=1), 0.0
        ),
        mode="drop",
    )
    dphi = dphi.at[safe].add(
        m * jnp.where(src_valid, bp, 0.0), mode="drop"
    )
    return dg, dphi
