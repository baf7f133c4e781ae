from active_3d_vision_and_touch_tpu.models.gcn import GCN, GCNLayer  # noqa: F401
from active_3d_vision_and_touch_tpu.models.touch import TouchChartEncoder  # noqa: F401
from active_3d_vision_and_touch_tpu.models.vision import (  # noqa: F401
    Deformation,
    ImageEncoder,
    prepare_charts,
)
from active_3d_vision_and_touch_tpu.models.autoencoder import (  # noqa: F401
    MeshAutoEncoder,
)
