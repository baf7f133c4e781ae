"""active_3d_vision_and_touch_tpu — a TPU-native framework for active 3D shape
reconstruction from vision and touch.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
facebookresearch/Active-3D-Vision-and-Touch ("pterotactyl"): a simulated
multi-finger robot hand grasps 3D objects, optical touch sensors on the
fingertips produce tactile images, and learned models reconstruct the object
surface from vision + touch while an active policy chooses the most
informative grasps.

Layering (bottom → top):

- ``core``      pure geometry: chart meshes, adjacency build/fuse, action sphere
- ``ops``       device kernels: Chamfer (Pallas), area-weighted sampling,
                NeRF encoding, bilinear image pooling, voxel/ODM carving
- ``models``    flax modules: touch-chart CNN, vision deformation GCN,
                mesh autoencoder, policy value networks
- ``parallel``  device-mesh / sharding utilities (DP over ICI via pjit)
- ``sim``       host-side simulator: articulated hand FK, convex-hull grasp
                placement, triangle rasterizer (C++ + numpy), gel renderer
- ``data``      procedural dataset generation + prefetching loaders
- ``train``     experiment engines (optax/orbax, config JSON, early stop)
- ``active``    active-touch environment + the 8 policy families

Short alias: ``import active_3d_vision_and_touch_tpu as a3vt``.
"""

__version__ = "0.1.0"

TOUCH_CHART_VERTS = 25
NUM_FINGERS = 4
