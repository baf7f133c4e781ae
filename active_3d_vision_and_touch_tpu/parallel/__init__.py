from active_3d_vision_and_touch_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_parallel_mesh,
    replicate,
    shard_batch,
)
