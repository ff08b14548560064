"""Exact k-nearest-neighbor search as a blocked TPU sweep.

Replaces the reference's NearestNeighbors.jl KD-tree (getNeighbors,
polytrope_hydroKDTree.jl:118-163). Tree traversal is data-dependent
branching — hostile to XLA — so instead the search is a dense, tiled
running-top-k:

  for each query row block (Bq, 3):
      for each planar candidate column block (x/y/z, each (Bc,)):
          d2 = dx*dx + dy*dy + dz*dz              (exact per-axis VPU diffs)
          merge into the running (Bq, K) best via lax.top_k

Static shapes, no recompilation between steps, O(M*N) work streamed on the
VPU. (At scale the production O(N) neighbor path is the masked cell-tile
engine, physics/tiles.py — this module is the always-correct fallback,
the oracle in tests, and the outlier lane's exact pass.) The per-axis
diff form (not the |q|^2+|c|^2-2qc matmul form) is deliberate: it is exact
in f32 where the matmul form loses low bits to cancellation, so the
returned d2 can be trusted directly (see the inline comment below).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("k", "block_q", "block_c"))
def knn(
    ri: jnp.ndarray,
    rj: jnp.ndarray,
    k: int,
    *,
    block_q: int = 512,
    block_c: int = 2048,
):
    """k nearest neighbors of each row of ri among the rows of rj.

    Returns (idx, d2): idx (M, k) int32 sorted by squared distance
    ascending (self first when ri is rj), d2 (M, k) exact per-axis-diff
    squared distances (naturally >= 0).
    """
    m_q = ri.shape[0]
    n_c = rj.shape[0]
    if k > n_c:
        raise ValueError(f"k={k} exceeds candidate count {n_c}")
    bq = min(block_q, _ceil_to(m_q, 8))
    bc = min(block_c, _ceil_to(n_c, 128))

    mp = _ceil_to(m_q, bq)
    npad = _ceil_to(n_c, bc)
    ri_p = jnp.pad(ri, ((0, mp - m_q), (0, 0)))
    # planar candidate coordinates: (X, 3)-trailing layouts lane-pad 3->128
    # on TPU, and the matmul form |q|^2+|c|^2-2qc loses the cancellation
    # battle to the MXU's bf16 multiplies — explicit per-axis diffs are
    # exact f32 on the VPU
    cj = [jnp.pad(rj[:, a], (0, npad - n_c)) for a in range(3)]
    n_col_blocks = npad // bc
    big = jnp.asarray(jnp.finfo(ri.dtype).max, ri.dtype)

    def row_block(qb):
        def col_body(c, carry):
            best_d, best_i = carry
            dx = qb[:, 0:1] - lax.dynamic_slice(cj[0], (c * bc,), (bc,))[None, :]
            dy = qb[:, 1:2] - lax.dynamic_slice(cj[1], (c * bc,), (bc,))[None, :]
            dz = qb[:, 2:3] - lax.dynamic_slice(cj[2], (c * bc,), (bc,))[None, :]
            d2 = dx * dx + dy * dy + dz * dz
            col_idx = c * bc + jax.lax.broadcasted_iota(jnp.int32, (1, bc), 1)
            d2 = jnp.where(col_idx < n_c, d2, big)
            cat_d = jnp.concatenate([best_d, d2], axis=1)
            cat_i = jnp.concatenate(
                [best_i, jnp.broadcast_to(col_idx, d2.shape)], axis=1
            )
            neg_top, pos = lax.top_k(-cat_d, k)
            return -neg_top, jnp.take_along_axis(cat_i, pos, axis=1)

        init = (
            jnp.full((bq, k), big, ri.dtype),
            jnp.full((bq, k), -1, jnp.int32),
        )
        return lax.fori_loop(0, n_col_blocks, col_body, init)

    best_d, best_i = lax.map(row_block, ri_p.reshape(mp // bq, bq, 3))
    idx = best_i.reshape(mp, k)[:m_q]
    d2 = jnp.maximum(best_d.reshape(mp, k)[:m_q], 0.0)
    return idx, d2
