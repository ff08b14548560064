from .step import (  # noqa: F401
    make_sharded_chunk_runner,
    make_sharded_step,
    particle_mesh,
    shard_state,
)
