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


@functools.partial(jax.jit, static_argnames=("block_q", "block_c"))
def gravity_allpairs(
    pos: jnp.ndarray,
    h: jnp.ndarray,
    m,
    *,
    block_q: int = 256,
    block_c: int = 2048,
):
    """Returns (g, PHI): g (N,3) with g_i = sum_j m gphi(r_ij; h_ij) d_ij,
    PHI (N,) = sum_j m phi(r_ij; h_ij) - (7/5) m / h_i."""
    n = pos.shape[0]
    bq = min(block_q, _ceil_to(n, 8))
    bc = min(block_c, _ceil_to(n, 128))
    np_rows = _ceil_to(n, bq)
    np_cols = _ceil_to(n, bc)

    pos_r = jnp.pad(pos, ((0, np_rows - n), (0, 0)))
    h_r = jnp.pad(h, (0, np_rows - n), constant_values=1.0)
    pos_c = jnp.pad(pos, ((0, np_cols - n), (0, 0)))
    h_c = jnp.pad(h, (0, np_cols - n), constant_values=1.0)
    n_col_blocks = np_cols // bc

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (np_rows // bq, bq), 1) + (
        jax.lax.broadcasted_iota(jnp.int32, (np_rows // bq, bq), 0) * bq
    )

    def row_block(args):
        qpos, qh, qid = args

        def col_body(c, carry):
            g_acc, phi_acc = carry
            cols = lax.dynamic_slice(pos_c, (c * bc, 0), (bc, 3))
            ch = lax.dynamic_slice(h_c, (c * bc,), (bc,))
            cid = c * bc + jax.lax.broadcasted_iota(jnp.int32, (1, bc), 1)
            d = qpos[:, None, :] - cols[None, :, :]  # (bq, bc, 3)
            r = jnp.sqrt(jnp.sum(d * d, axis=-1))
            h_ij = 0.5 * (qh[:, None] + ch[None, :])
            valid = (cid < n) & (cid != qid[:, None])
            gp = jnp.where(valid, softened_gphi_over_r(r, h_ij), 0.0)
            pp = jnp.where(valid, softened_phi(r, h_ij), 0.0)
            g_acc = g_acc + jnp.sum(gp[..., None] * d, axis=1)
            phi_acc = phi_acc + jnp.sum(pp, axis=1)
            return g_acc, phi_acc

        init = (jnp.zeros((bq, 3), pos.dtype), jnp.zeros((bq,), pos.dtype))
        return lax.fori_loop(0, n_col_blocks, col_body, init)

    g, phi = lax.map(
        row_block,
        (
            pos_r.reshape(np_rows // bq, bq, 3),
            h_r.reshape(np_rows // bq, bq),
            row_ids,
        ),
    )
    g = m * g.reshape(np_rows, 3)[:n]
    phi = m * phi.reshape(np_rows)[:n] - m * 1.4 / h
    return g, phi
