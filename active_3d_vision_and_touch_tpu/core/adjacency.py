"""Graph construction for the chart-atlas meshes.

Builds the dense row-normalized adjacency matrices consumed by the GCN
models.  Capability-parity with the reference's graph builder
(``pterotactyl/utility/utils.py``):

- :func:`calc_adj`       — faces → dense binary adjacency with self loops
                           (reference ``utils.py:134-148``)
- :func:`normalize_adj`  — row normalization (reference ``utils.py:47-52``)
- :func:`fuse_touch`     — append ``num_fingers * num_grasps`` copies of the
                           touch-chart graph to the vision atlas; coincident
                           vision boundary vertices become a clique, and each
                           touch chart's central vertex is wired to every
                           such boundary vertex (reference ``utils.py:75-130``)
- :func:`build_adj_info` — the ``AdjInfo`` bundle (reference ``adj_init``,
                           ``utils.py:56-71``)

All of this is one-time host-side numpy; ``AdjInfo.device()`` uploads the
dense matrices as jnp constants.  The matrices are small (≈2k x 2k) — dense
is the right TPU layout: one MXU matmul per GCN layer instead of a sparse
gather.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np

from active_3d_vision_and_touch_tpu.core.mesh import (
    Mesh,
    TOUCH_CHART_CENTER,
    touch_chart,
)


def calc_adj(faces: np.ndarray, num_verts: int | None = None) -> np.ndarray:
    """Dense symmetric binary adjacency (with self loops) from faces."""
    faces = np.asarray(faces)
    if num_verts is None:
        num_verts = int(faces.max()) + 1
    adj = np.eye(num_verts, dtype=np.float32)
    v1, v2, v3 = faces[:, 0], faces[:, 1], faces[:, 2]
    adj[v1, v2] = 1
    adj[v1, v3] = 1
    adj[v2, v1] = 1
    adj[v2, v3] = 1
    adj[v3, v1] = 1
    adj[v3, v2] = 1
    return adj


def normalize_adj(adj: np.ndarray) -> np.ndarray:
    """Row-normalize so each row sums to 1 (rows with zero sum stay zero)."""
    rowsum = adj.sum(axis=1, keepdims=True)
    inv = np.where(rowsum > 0, 1.0 / np.maximum(rowsum, 1e-30), 0.0)
    return (adj * inv).astype(np.float32)


def _coincident_groups(verts: np.ndarray) -> list[list[int]]:
    """Groups of vertex indices with bit-identical float32 positions."""
    table: dict[bytes, list[int]] = {}
    for e, v in enumerate(np.asarray(verts, np.float32)):
        table.setdefault(v.tobytes(), []).append(e)
    return [g for g in table.values() if len(g) > 1]


def fuse_touch(
    vision: Mesh,
    num_charts: int,
    chart: Mesh | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fuse ``num_charts`` copies of the touch-chart graph onto the vision
    atlas graph.

    Returns (adj, faces, central_indices): the un-normalized fused adjacency,
    the fused face list (touch-chart faces offset past the vision verts), and
    the index of each touch chart's central vertex in the fused graph.
    """
    chart = chart or touch_chart()
    v_adj = calc_adj(vision.faces, vision.num_verts)
    c_adj = calc_adj(chart.faces, chart.num_verts)
    nv, nc = vision.num_verts, chart.num_verts

    dim = nv + num_charts * nc
    adj = np.zeros((dim, dim), np.float32)
    adj[:nv, :nv] = v_adj
    faces = [vision.faces]
    centers = []
    for i in range(num_charts):
        s = nv + i * nc
        adj[s : s + nc, s : s + nc] = c_adj
        faces.append(chart.faces + s)
        centers.append(s + TOUCH_CHART_CENTER)
    centers = np.array(centers, np.int32)

    # stitch: coincident vision boundary verts form a clique and talk to the
    # central vertex of every touch chart (bidirectionally)
    for group in _coincident_groups(vision.verts):
        g = np.array(group)
        adj[np.ix_(g, g)] = 1
        adj[np.ix_(g, centers)] = 1
        adj[np.ix_(centers, g)] = 1

    return adj, np.concatenate(faces, axis=0), centers


@dataclass(frozen=True)
class AdjInfo:
    """Bundle handed to GCN models.

    ``original``: normalized vision-only adjacency (used by deformation
    stage 1 when image features are present; reference ``vision/model.py:
    316-320``).  ``adj``: normalized fused adjacency. ``faces``: fused face
    list for mesh sampling / Chamfer scoring.
    """

    original: np.ndarray  # (Vv, Vv)
    adj: np.ndarray  # (V, V)
    faces: np.ndarray  # (F, 3)
    centers: np.ndarray  # (num_charts,)
    num_vision_verts: int
    num_charts: int
    chart_size: int

    @property
    def num_verts(self) -> int:
        return int(self.adj.shape[0])

    def device(self):
        """Upload dense matrices to the default device as jnp arrays."""
        import jax.numpy as jnp

        return replace(
            self,
            original=jnp.asarray(self.original),
            adj=jnp.asarray(self.adj),
        )


def build_adj_info(
    vision: Mesh,
    use_touch: bool = True,
    num_fingers: int = 4,
    num_grasps: int = 5,
    chart: Mesh | None = None,
) -> AdjInfo:
    """Build the AdjInfo for a given experiment configuration."""
    chart = chart or touch_chart()
    original = normalize_adj(calc_adj(vision.faces, vision.num_verts))
    if use_touch:
        num_charts = num_fingers * num_grasps
        adj, faces, centers = fuse_touch(vision, num_charts, chart)
        adj = normalize_adj(adj)
    else:
        # without touch the atlas is used as-is: charts stay disconnected,
        # matching the reference (fusing/stitching only happens in
        # adj_fuse_touch, utils.py:65-66)
        num_charts = 0
        adj = original
        faces = vision.faces
        centers = np.zeros((0,), np.int32)
    return AdjInfo(
        original=original,
        adj=adj,
        faces=faces,
        centers=centers,
        num_vision_verts=vision.num_verts,
        num_charts=num_charts,
        chart_size=chart.num_verts,
    )
