from active_3d_vision_and_touch_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_parallel_mesh,
    hybrid_mesh,
    maybe_init_distributed,
    replicate,
    shard_batch,
)
