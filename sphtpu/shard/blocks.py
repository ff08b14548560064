"""Sharded block-compact engine: block-sharded work, replicated state.

Same distribution strategy as the strip-sharded multi-level engine
(shard/mlevel.py, whose generic work-sharded chunk runner this reuses):
the block engine's hot loops are flat per-bucket block lists — each of P
devices sweeps a contiguous 1/P slice of every bucket (the planner pads
bucket lengths to a multiple of lcm(BLK_GRAN, P), so slices are exact),
computes phase A/B for its blocks only, and the per-row outputs psum
over the mesh. Work balance is exact at any density contrast because
blocks are work units, not space units.

Memory per chip is O(N) replicated state + 1/P of the candidate index
tables. Far field: exact mode row-shards the Newtonian sweep; p3m
recomputes the small FFT mesh redundantly per chip (zero collectives).

Certification follows the freeze protocol of the other sharded engines:
a failed collective certificate freezes the chunk; the host refreshes
BlockArgs into the same compiled spec (block_args_for_spec) or re-plans.

Tests: tests/test_shard_blocks.py pins sharded == unsharded on the
committed deep-collapse fixture on the 8-virtual-device CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..engine.config import EngineConfig, Params
from ..physics.blocks import BlockArgs, block_sph_forces, build_cand_tables
from .mlevel import _make_workshard_chunk_runner
from .tiles import AXIS


def blockargs_tree(args: BlockArgs):
    """BlockArgs as a device-ready pytree of jnp arrays (host BlockArgs
    carries numpy; shapes are static per spec so refreshing contents
    does not recompile)."""
    return BlockArgs(
        order_q=jnp.asarray(args.order_q, jnp.int32),
        order_c=jnp.asarray(args.order_c, jnp.int32),
        pos_ref=jnp.asarray(args.pos_ref),
        half_ref=jnp.asarray(args.half_ref),
        boxes=tuple(jnp.asarray(b, jnp.int32) for b in args.boxes),
        starts=tuple(jnp.asarray(s, jnp.int32) for s in args.starts),
    )


def make_blocks_chunk_runner(cfg: EngineConfig, mesh: Mesh):
    """Jitted chunk(state, params, h0, bargs, n_steps) -> (state, stats
    (S,10), valid (S,), cert_fail (S,), h_last, rho_last) running the
    block-compact engine work-sharded over `mesh`. The spec must have
    been planned with shards = mesh size (bucket granularity)."""
    assert cfg.blocks is not None
    n_shards = int(np.prod(mesh.devices.shape))
    for _, nb in cfg.blocks[0]:
        assert nb % n_shards == 0, "spec not planned for this mesh size"
    use_pallas = (
        cfg.pallas_a
        if cfg.pallas_a is not None
        else jax.default_backend() == "tpu" and cfg.dtype == "float32"
    )

    def engine_force(p: Params, pos, vel, K, h_hint, bargs, aux):
        return block_sph_forces(
            pos, vel, p.m, K, h_hint, bargs,
            eos=cfg.eos, gamma=p.gamma, cs0=p.cs0, alpha=p.alpha,
            beta=p.beta, kh=cfg.kh, spec=cfg.blocks, gravity=cfg.gravity,
            mesh_factor=cfg.mesh_factor, sigma_cells=cfg.sigma_cells,
            axis=AXIS, n_shards=n_shards, pallas_a=use_pallas,
            idx_tables=aux,
        )

    def make_aux(bargs):
        # this device's slice of the candidate index tables, built once
        # per chunk outside the step scan
        return build_cand_tables(
            bargs, cfg.blocks, cfg.n, axis=AXIS, n_shards=n_shards
        )

    return _make_workshard_chunk_runner(cfg, mesh, engine_force, make_aux)
