from active_3d_vision_and_touch_tpu.train.common import (  # noqa: F401
    CheckpointManager,
    EarlyStop,
    MetricsWriter,
)
