from cstp_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    maybe_initialize_distributed,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    shard_state,
    replicate,
    spatial_constraint_fn,
)
