"""Visualization: action-coverage plots, prediction renders, depth images.

Covers the reference's visualization toolkit (``utility/utils.py:556-668``
and ``utility/pretty_render.py``) using our own renderer instead of
pyrender: per-policy action histograms + equirectangular sphere-coverage
maps, and side-by-side renders of predicted meshes / sampled points / GT.
"""

from __future__ import annotations

import math
import os

import numpy as np

from active_3d_vision_and_touch_tpu.core.actions import action_sphere
from active_3d_vision_and_touch_tpu.core.camera import PinholeCamera
from active_3d_vision_and_touch_tpu.core.mesh import Mesh
from active_3d_vision_and_touch_tpu.sim.vision_render import SceneRenderer


def _save_png(path: str, array: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(array.astype(np.uint8)).save(path)


def visualize_depth(depth: np.ndarray, max_depth: float = 0.025) -> np.ndarray:
    """Depth map → display-friendly uint8 (reference ``utils.py:556-560``)."""
    d = np.asarray(depth).copy()
    d[d > max_depth] = 0
    return (255 * d / max_depth).astype(np.uint8)


def _sphere_pixel(point, num_actions: int):
    """Equirectangular pixel for a unit direction (same longitude shift as
    the reference's plots so maps are comparable, ``utils.py:573-579``)."""
    x, y, z = point
    lon = math.atan2(-x, y)
    lon = (lon + np.pi / 2.0) / (2 * np.pi) + np.pi * (28.670 / 360.0)
    lat = math.acos(max(-1.0, min(1.0, z))) / np.pi
    row = int(lat * num_actions * 12 / (2 * np.pi))
    col = int(lon * num_actions * 24 / (2 * np.pi))
    return row, col


def camera_visible_actions(num_actions: int = 50) -> np.ndarray:
    """Boolean mask of action directions on the camera-facing hemisphere —
    the equivalent of the reference's precomputed ``objects/visible.obj``
    subset (``utility/utils.py:596-600``): with vision in play, coverage
    maps distinguish grasp directions the camera can actually see."""
    sphere = action_sphere(num_actions)
    cam = np.asarray(PinholeCamera().position, np.float64)
    cam /= np.linalg.norm(cam)
    return (sphere @ cam) > 0.0


def visualize_actions(
    location: str,
    actions: np.ndarray,
    num_actions: int = 50,
    use_img: bool = False,
) -> None:
    """Histogram + sphere-coverage map of the actions a policy used.  With
    ``use_img`` the map additionally marks the camera-visible hemisphere
    (reference ``utils.py:592-609``)."""
    os.makedirs(location, exist_ok=True)
    actions = np.asarray(actions).reshape(-1).astype(int)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.hist(actions, bins=np.arange(0, num_actions + 1))
    plt.title("actions histogram")
    plt.savefig(os.path.join(location, "histogram.png"))
    plt.close()

    sphere = action_sphere(num_actions)
    canvas = np.zeros((num_actions * 2, num_actions * 4, 3))
    for i in range(num_actions):  # faint grid of all candidate directions
        r, c = _sphere_pixel(sphere[i], num_actions)
        canvas[r - 1 : r + 2, c - 1 : c + 2] += 1.0
    for a in actions:
        r, c = _sphere_pixel(sphere[a], num_actions)
        canvas[r - 1 : r + 2, c - 1 : c + 2] += 1.0
    canvas = canvas * 255.0 / max(canvas.max(), 1e-9)
    if use_img:
        # mark the camera-visible hemisphere in the green channel so
        # coverage reads against what the vision tower can see
        for i in np.nonzero(camera_visible_actions(num_actions))[0]:
            r, c = _sphere_pixel(sphere[i], num_actions)
            canvas[r - 1 : r + 2, c - 1 : c + 2, 1] = np.maximum(
                canvas[r - 1 : r + 2, c - 1 : c + 2, 1], 96.0
            )
    canvas[np.all(canvas == 0, axis=-1)] = (0, 204, 204)
    _save_png(os.path.join(location, "sphere_projection.png"), canvas)


def _fitted_camera(coords: np.ndarray, fit: bool) -> PinholeCamera:
    """The fixed paper camera, pulled back along its axis when the object
    overflows the frame (v4 draws per-axis scales up to 2.2x the ±0.16
    canonical extent — result renders should show the whole shape; the
    MODEL's pooling camera is untouched)."""
    cam = PinholeCamera()
    if fit:
        r = float(np.abs(np.asarray(coords)).max())
        k = max(1.0, r / 0.16)
        if k > 1.0:
            cam = PinholeCamera(position=tuple(np.array(cam.position) * k))
    return cam


def render_mesh_image(
    verts: np.ndarray, faces: np.ndarray, fit: bool = False
) -> np.ndarray:
    renderer = SceneRenderer(_fitted_camera(verts, fit))
    return renderer.render(
        [Mesh(verts, faces)], [np.array([228.0, 217.0, 111.0])]
    )


def render_points_image(
    points: np.ndarray, size: int = 256, fit: bool = False
) -> np.ndarray:
    """Splat a point cloud through the scene camera."""
    cam = _fitted_camera(points, fit)
    uvz = cam.project(np.asarray(points))
    img = np.full((size, size, 3), 255, np.uint8)
    u = np.clip(uvz[:, 0].astype(int), 0, size - 1)
    v = np.clip(uvz[:, 1].astype(int), 0, size - 1)
    img[v, u] = (60, 90, 200)
    return img


def debug_projection_overlay(
    image: np.ndarray, verts: np.ndarray, out_path: str | None = None
) -> np.ndarray:
    """Splat projected mesh vertices onto a rendered scene image to verify
    the camera matrix the projection pooling uses (reference
    ``reconstruction/vision/model.py:105-145`` ``debug_pooling``).  If the
    red dots sit on the object silhouette, the pooling grid samples the
    right pixels; a shifted/flipped overlay exposes a camera mismatch
    immediately.  Cheap insurance even with the shared-camera design —
    ``core/camera.py`` is the single source the renderer AND the model
    pool through."""
    img = np.asarray(image).copy()
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    size = img.shape[0]
    cam = PinholeCamera()
    uvz = cam.project(np.asarray(verts).reshape(-1, 3))
    u = np.clip(uvz[:, 0].astype(int), 0, size - 1)
    v = np.clip(uvz[:, 1].astype(int), 0, size - 1)
    img[v, u] = (255, 0, 0)
    if out_path is not None:
        _save_png(out_path, img)
    return img


def visualize_prediction(
    location: str,
    meshes: np.ndarray,  # (B, V, 3) predicted vertices
    faces: np.ndarray,
    names: list[str],
    gt_points: np.ndarray | None = None,  # (B, N, 3)
) -> list[str]:
    """Render each prediction (and optionally its GT cloud) to PNGs
    (reference ``utils.py:657-668`` + ``pretty_render.py:119-158``)."""
    out_dirs = []
    for i, name in enumerate(names):
        short = str(name).rstrip("/").split("/")[-1]
        out = os.path.join(location, short)
        os.makedirs(out, exist_ok=True)
        # frame prediction and GT through the SAME fitted camera so the
        # pair is visually comparable
        ref = (
            gt_points[i]
            if gt_points is not None
            else np.asarray(meshes[i])
        )
        cam = _fitted_camera(ref, fit=True)
        _save_png(
            os.path.join(out, "prediction.png"),
            SceneRenderer(cam).render(
                [Mesh(np.asarray(meshes[i]), np.asarray(faces))],
                [np.array([228.0, 217.0, 111.0])],
            ),
        )
        if gt_points is not None:
            pts = np.asarray(gt_points[i])
            uvz = cam.project(pts)
            img = np.full((256, 256, 3), 255, np.uint8)
            u = np.clip(uvz[:, 0].astype(int), 0, 255)
            v = np.clip(uvz[:, 1].astype(int), 0, 255)
            img[v, u] = (60, 90, 200)
            _save_png(os.path.join(out, "ground_truth_points.png"), img)
        out_dirs.append(out)
    return out_dirs
