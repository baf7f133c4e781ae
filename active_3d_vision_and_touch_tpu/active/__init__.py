from active_3d_vision_and_touch_tpu.active.env import ActiveTouchEnv  # noqa: F401
from active_3d_vision_and_touch_tpu.active.replay import ReplayMemory  # noqa: F401
