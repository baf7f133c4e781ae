from active_3d_vision_and_touch_tpu.core.mesh import (  # noqa: F401
    Mesh,
    load_obj,
    save_obj,
    touch_chart,
    vision_charts,
    TOUCH_CHART_CENTER,
)
from active_3d_vision_and_touch_tpu.core.adjacency import (  # noqa: F401
    AdjInfo,
    calc_adj,
    normalize_adj,
    build_adj_info,
)
from active_3d_vision_and_touch_tpu.core.actions import action_sphere  # noqa: F401
