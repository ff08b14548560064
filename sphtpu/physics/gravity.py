"""Softened self-gravity as a blocked all-pairs sweep.

The reference walks a Barnes-Hut octree per particle with a Deque and a
dual opening criterion (gravOctree_Single.jl:239-278). Data-dependent tree
walks do not map to TPU; instead every pair is evaluated with the same
softened kernels the octree applies at its leaves (h_ij = (h_i + h_j)/2,
gravOctree_Single.jl:261-263) — i.e. the exact theta -> 0 limit of the
reference, tiled so the VPU streams (block_q x block_c) pair tiles out of
VMEM. Cost is O(N^2) but regular; at the reference's scales this beats a
host tree walk by orders of magnitude and it shards over chips as a row
partition (see sphtpu.shard).

Matches gravity_acc (gravOctree_Single.jl:280-304): self-pair excluded,
potential gets the -(7/5) m / h_i self-softening correction. Returned g is
*per unit G*; the caller applies acc -= G g (polytrope_sim.jl:43-45).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..kernels import softened_gphi_over_r, softened_phi


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def gravity_sweep(
    pos_q: jnp.ndarray,
    h_q: jnp.ndarray,
    qid: jnp.ndarray,
    pos_cols: jnp.ndarray,
    h_cols: jnp.ndarray,
    *,
    block_q: int = 256,
    block_c: int = 2048,
):
    """Blocked pair sweep of M query rows against N candidate columns.

    qid (M,) are the queries' *global* candidate indices, used to exclude
    the self pair (pass -1 for probe points that are not in the candidate
    set). Returns (g, phi) per unit mass and G: g_i = sum_j gphi d_ij,
    phi_i = sum_j phi_ij. The sharded layer calls this with the local row
    block against the all-gathered global set.
    """
    m_q = pos_q.shape[0]
    n = pos_cols.shape[0]
    bq = min(block_q, _ceil_to(m_q, 8))
    bc = min(block_c, _ceil_to(n, 128))
    np_rows = _ceil_to(m_q, bq)
    np_cols = _ceil_to(n, bc)

    pos_r = jnp.pad(pos_q, ((0, np_rows - m_q), (0, 0)))
    h_r = jnp.pad(h_q, (0, np_rows - m_q), constant_values=1.0)
    qid_r = jnp.pad(qid.astype(jnp.int32), (0, np_rows - m_q), constant_values=-2)
    # planar column coordinates: (X, 3)-trailing arrays lane-pad 3->128 on
    # TPU, so the pair tile works on per-axis (bq, bc) planes
    cx = jnp.pad(pos_cols[:, 0], (0, np_cols - n))
    cy = jnp.pad(pos_cols[:, 1], (0, np_cols - n))
    cz = jnp.pad(pos_cols[:, 2], (0, np_cols - n))
    h_c = jnp.pad(h_cols, (0, np_cols - n), constant_values=1.0)
    n_col_blocks = np_cols // bc

    def row_block(args):
        qpos, qh, qids = args

        def col_body(c, carry):
            gx, gy, gz, phi_acc = carry
            dx = qpos[:, 0:1] - lax.dynamic_slice(cx, (c * bc,), (bc,))[None, :]
            dy = qpos[:, 1:2] - lax.dynamic_slice(cy, (c * bc,), (bc,))[None, :]
            dz = qpos[:, 2:3] - lax.dynamic_slice(cz, (c * bc,), (bc,))[None, :]
            ch = lax.dynamic_slice(h_c, (c * bc,), (bc,))
            cid = c * bc + jax.lax.broadcasted_iota(jnp.int32, (1, bc), 1)
            r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            h_ij = 0.5 * (qh[:, None] + ch[None, :])
            valid = (cid < n) & (cid != qids[:, None])
            gp = jnp.where(valid, softened_gphi_over_r(r, h_ij), 0.0)
            pp = jnp.where(valid, softened_phi(r, h_ij), 0.0)
            return (
                gx + jnp.sum(gp * dx, axis=1),
                gy + jnp.sum(gp * dy, axis=1),
                gz + jnp.sum(gp * dz, axis=1),
                phi_acc + jnp.sum(pp, axis=1),
            )

        zero = jnp.zeros((bq,), pos_q.dtype)
        return lax.fori_loop(0, n_col_blocks, col_body, (zero, zero, zero, zero))

    gx, gy, gz, phi = lax.map(
        row_block,
        (
            pos_r.reshape(np_rows // bq, bq, 3),
            h_r.reshape(np_rows // bq, bq),
            qid_r.reshape(np_rows // bq, bq),
        ),
    )
    g = jnp.stack(
        [gx.reshape(np_rows), gy.reshape(np_rows), gz.reshape(np_rows)], axis=1
    )[:m_q]
    return g, phi.reshape(np_rows)[:m_q]


@functools.partial(jax.jit, static_argnames=("block_q", "block_c"))
def gravity_newton_allpairs(
    pos: jnp.ndarray,
    m,
    *,
    block_q: int = 256,
    block_c: int = 2048,
):
    """Pure-Newtonian all-pairs sweep (g, PHI), self pair excluded via
    r = 0, ~3x cheaper per pair than the softened kernels. The tile
    engine's near-field correction (physics/tiles.py) turns this into the
    reference's softened gravity exactly."""
    n = pos.shape[0]
    bq = min(block_q, _ceil_to(n, 8))
    bc = min(block_c, _ceil_to(n, 128))
    np_rows = _ceil_to(n, bq)
    np_cols = _ceil_to(n, bc)

    pos_r = jnp.pad(pos, ((0, np_rows - n), (0, 0)))
    cx = jnp.pad(pos[:, 0], (0, np_cols - n))
    cy = jnp.pad(pos[:, 1], (0, np_cols - n))
    cz = jnp.pad(pos[:, 2], (0, np_cols - n))
    n_col_blocks = np_cols // bc

    def row_block(qpos):
        def col_body(c, carry):
            gx, gy, gz, phi_acc = carry
            dx = qpos[:, 0:1] - lax.dynamic_slice(cx, (c * bc,), (bc,))[None, :]
            dy = qpos[:, 1:2] - lax.dynamic_slice(cy, (c * bc,), (bc,))[None, :]
            dz = qpos[:, 2:3] - lax.dynamic_slice(cz, (c * bc,), (bc,))[None, :]
            cid = c * bc + jax.lax.broadcasted_iota(jnp.int32, (1, bc), 1)
            r2 = dx * dx + dy * dy + dz * dz
            valid = (cid < n) & (r2 > 0)
            inv_r = jnp.where(valid, lax.rsqrt(jnp.where(r2 > 0, r2, 1.0)), 0.0)
            inv_r3 = inv_r * inv_r * inv_r
            return (
                gx + jnp.sum(inv_r3 * dx, axis=1),
                gy + jnp.sum(inv_r3 * dy, axis=1),
                gz + jnp.sum(inv_r3 * dz, axis=1),
                phi_acc - jnp.sum(inv_r, axis=1),
            )

        zero = jnp.zeros((bq,), pos.dtype)
        return lax.fori_loop(0, n_col_blocks, col_body, (zero, zero, zero, zero))

    gx, gy, gz, phi = lax.map(
        row_block, pos_r.reshape(np_rows // bq, bq, 3)
    )
    g = m * jnp.stack(
        [gx.reshape(np_rows), gy.reshape(np_rows), gz.reshape(np_rows)], axis=1
    )[:n]
    return g, m * phi.reshape(np_rows)[:n]


@functools.partial(jax.jit, static_argnames=("block_q", "block_c"))
def gravity_allpairs(
    pos: jnp.ndarray,
    h: jnp.ndarray,
    m,
    *,
    block_q: int = 256,
    block_c: int = 2048,
):
    """Single-device entry: (g, PHI) with g_i = sum_j m gphi(r_ij; h_ij)
    d_ij and PHI_i = sum_j m phi(r_ij; h_ij) - (7/5) m / h_i."""
    n = pos.shape[0]
    qid = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    g, phi = gravity_sweep(
        pos, h, qid, pos, h, block_q=block_q, block_c=block_c
    )
    return m * g, m * phi - m * 1.4 / h
