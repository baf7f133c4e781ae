from active_3d_vision_and_touch_tpu.data.primitives import random_object  # noqa: F401
