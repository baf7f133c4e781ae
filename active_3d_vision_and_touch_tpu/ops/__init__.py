from active_3d_vision_and_touch_tpu.ops.encoding import nerf_embedding  # noqa: F401
from active_3d_vision_and_touch_tpu.ops.sample import batch_sample  # noqa: F401
from active_3d_vision_and_touch_tpu.ops.chamfer import (  # noqa: F401
    chamfer_distance,
    mesh_chamfer_distance,
)
from active_3d_vision_and_touch_tpu.ops.grid_sample import (  # noqa: F401
    bilinear_sample,
)
