"""Multi-host (DCN) distribution layer.

The reference is single-process (SURVEY.md §2: no Distributed/MPI/CUDA
anywhere in the Julia tree), so this layer has no reference counterpart
— it is the TPU-native distributed backend the blueprint makes
first-class (SURVEY.md §5: "jax.distributed + pjit/shard_map
collectives ... DCN only for multi-host init and checkpoint I/O").

Design:

*   `initialize()` wraps `jax.distributed.initialize` (coordinator
    address / process count / process id from args or the standard env
    vars). After it, `jax.devices()` is the GLOBAL device list.
*   `global_mesh()` builds the 1-D particle/work mesh over all global
    devices in process-major order: a contiguous slice of the mesh axis
    lives on one host, so the slab engine's neighbor ppermute hops and
    the work-sharded engines' block slices stay on ICI; only the psum
    reductions and the one boundary hop per slab cross DCN.
*   State stays replicated across processes for the work-sharded
    engines (shard/blocks.py, shard/mlevel.py): every process feeds the
    SAME host values into `replicate()` (jax.device_put to a fully-
    replicated NamedSharding — supported multi-process for identical
    inputs), each device sweeps its slice of every bucket's block list,
    and the in-engine psum combines over ICI+DCN. Replicated outputs
    come back to host numpy via `host_local()` (np.asarray refuses
    non-fully-addressable arrays).
*   I/O is process-local: only process 0 (`is_primary()`) writes
    snapshots, stats, and figures. All processes run the same
    deterministic host planning from the same replicated state, so
    specs/BlockArgs agree without communication.

Tested without multi-host hardware by tests/test_multihost.py: two CPU
processes x 4 virtual devices each over a localhost coordinator (Gloo
collectives), sharded == single-process at f64 roundoff, and only
process 0's run directory gains files.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .tiles import AXIS


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kwargs,
):
    """Join (or form) the multi-process runtime. Arguments default to
    the standard JAX env vars / cluster auto-detection
    (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID); on TPU
    pods jax.distributed.initialize auto-detects all three. Idempotent:
    a second call is a no-op."""
    if _already_initialized():
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def _already_initialized() -> bool:
    try:
        from jax._src import distributed

        return distributed.global_state.client is not None
    except Exception:
        return False


def is_primary() -> bool:
    """True on the process that owns snapshot/stats/figure I/O."""
    return jax.process_index() == 0


def global_mesh(axis: str = AXIS) -> Mesh:
    """1-D mesh over ALL global devices, process-major: contiguous mesh
    slices are intra-host (ICI); process boundaries are the only DCN
    edges."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), (axis,))


def replicate(tree, mesh: Mesh):
    """Fully-replicated global arrays from (identical-on-every-process)
    host values. This is the multi-process-safe way to feed the
    work-sharded chunk runners: plain jnp.asarray makes single-device
    arrays that a global-mesh jit rejects."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def host_local(x) -> np.ndarray:
    """Host numpy copy of a (replicated) array. Works for single-device
    arrays, fully-addressable sharded arrays, and multi-process
    replicated arrays (where np.asarray raises)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return np.asarray(x.addressable_data(0))
    return np.asarray(x)


def maybe_initialize_from_env():
    """CLI hook: initialize() iff the standard env vars are present (so
    `python -m sphtpu.cli --run ... --multihost` works under any
    launcher that exports them)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        initialize()
