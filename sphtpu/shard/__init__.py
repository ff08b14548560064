from .step import (  # noqa: F401
    make_sharded_chunk_runner,
    make_sharded_step,
    particle_mesh,
    shard_state,
)
from .tiles import (  # noqa: F401
    SlabPlan,
    SlabState,
    make_slab_chunk_runner,
    pack_state,
    plan_slabs,
    unpack_rows,
)
