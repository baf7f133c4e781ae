from active_3d_vision_and_touch_tpu.sim.hand import Hand  # noqa: F401
from active_3d_vision_and_touch_tpu.sim.grasp import AgnosticGrasp  # noqa: F401
from active_3d_vision_and_touch_tpu.sim.scene import Scene  # noqa: F401
from active_3d_vision_and_touch_tpu.sim.sampler import Sampler  # noqa: F401
