"""Host-side triangle rasterizer: C++ core with a numpy fallback.

Replaces the reference's pyrender/EGL offscreen rendering
(``simulator/rendering/touch_renderer.py:14-60``,
``vision_renderer.py:21-192``) with an in-repo native rasterizer.  The C++
library is compiled on first use (g++, see ``csrc/Makefile``); if the
toolchain is unavailable the numpy implementation produces identical
output (tested), just slower.

Conventions: camera rotation is a 3x3 world→camera matrix whose rows are
(right, down, forward); depth maps are (H, W) float32 camera-z with 0
meaning "no geometry"; face-id maps are int32 with -1 for misses.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
import threading

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libraster.so")
_LOCK = threading.Lock()
_LIB = None
_LIB_TRIED = False


def _load_library():
    global _LIB, _LIB_TRIED
    with _LOCK:
        if _LIB is not None or _LIB_TRIED:
            return _LIB
        _LIB_TRIED = True
        try:
            if not os.path.exists(_LIB_PATH) or os.path.getmtime(
                _LIB_PATH
            ) < os.path.getmtime(os.path.join(_CSRC, "raster.cpp")):
                subprocess.run(
                    ["make", "-s", "libraster.so"],
                    cwd=_CSRC,
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.rasterize_depth.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_float,
                ctypes.c_float,
                ctypes.c_float,
                ctypes.c_float,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_float,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.ray_mesh_hits.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int,
            ]
            lib.ray_mesh_hits.restype = ctypes.c_int
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def native_available() -> bool:
    return _load_library() is not None


def focal_from_yfov(yfov_deg: float, height: int) -> float:
    return (height / 2.0) / math.tan(math.radians(yfov_deg) / 2.0)


def _as_f32(x):
    return np.ascontiguousarray(x, np.float32)


def rasterize_depth(
    verts: np.ndarray,
    faces: np.ndarray,
    cam_pos: np.ndarray,
    cam_rot: np.ndarray,
    focal: float,
    width: int,
    height: int,
    znear: float = 1e-4,
    use_native: bool | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Render (depth (H,W) f32, face_id (H,W) i32)."""
    verts = _as_f32(verts).reshape(-1, 3)
    faces = np.ascontiguousarray(faces, np.int32).reshape(-1, 3)
    cam_pos = _as_f32(cam_pos).reshape(3)
    cam_rot = _as_f32(cam_rot).reshape(3, 3)
    lib = _load_library() if use_native in (None, True) else None
    if lib is not None and use_native is not False:
        depth = np.zeros((height, width), np.float32)
        face_id = np.full((height, width), -1, np.int32)
        lib.rasterize_depth(
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(verts),
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(faces),
            cam_pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cam_rot.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_float(focal),
            ctypes.c_float(focal),
            ctypes.c_float(width / 2.0),
            ctypes.c_float(height / 2.0),
            width,
            height,
            ctypes.c_float(znear),
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            face_id.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return depth, face_id
    return _rasterize_numpy(verts, faces, cam_pos, cam_rot, focal, width, height, znear)


def _rasterize_numpy(verts, faces, cam_pos, cam_rot, focal, width, height, znear):
    cam = (verts - cam_pos) @ cam_rot.T  # (V, 3)
    tri = cam[faces]  # (F, 3, 3)
    ok = np.all(tri[:, :, 2] > znear, axis=1)
    tri = tri[ok]
    ids = np.nonzero(ok)[0].astype(np.int32)
    depth = np.zeros((height, width), np.float32)
    face_id = np.full((height, width), -1, np.int32)
    if len(tri) == 0:
        return depth, face_id

    inv_z = 1.0 / tri[:, :, 2]
    xs = focal * tri[:, :, 0] * inv_z + width / 2.0
    ys = focal * tri[:, :, 1] * inv_z + height / 2.0

    # screen-space cull
    inside = (
        (xs.max(1) >= 0)
        & (xs.min(1) <= width - 1)
        & (ys.max(1) >= 0)
        & (ys.min(1) <= height - 1)
    )
    xs, ys, inv_z, ids = xs[inside], ys[inside], inv_z[inside], ids[inside]

    for f in range(len(ids)):
        ax, bx, cx = xs[f]
        ay, by, cy = ys[f]
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        if abs(area) < 1e-12:
            continue
        minx = max(0, int(np.floor(min(ax, bx, cx))))
        maxx = min(width - 1, int(np.ceil(max(ax, bx, cx))))
        miny = max(0, int(np.floor(min(ay, by, cy))))
        maxy = min(height - 1, int(np.ceil(max(ay, by, cy))))
        if minx > maxx or miny > maxy:
            continue
        px, py = np.meshgrid(
            np.arange(minx, maxx + 1, dtype=np.float32),
            np.arange(miny, maxy + 1, dtype=np.float32),
        )
        w0 = ((bx - px) * (cy - py) - (by - py) * (cx - px)) / area
        w1 = ((cx - px) * (ay - py) - (cy - py) * (ax - px)) / area
        w2 = 1.0 - w0 - w1
        mask = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not mask.any():
            continue
        z = 1.0 / (w0 * inv_z[f, 0] + w1 * inv_z[f, 1] + w2 * inv_z[f, 2])
        sub_d = depth[miny : maxy + 1, minx : maxx + 1]
        sub_i = face_id[miny : maxy + 1, minx : maxx + 1]
        better = mask & ((sub_d == 0) | (z < sub_d))
        sub_d[better] = z[better]
        sub_i[better] = ids[f]
    return depth, face_id


def ray_mesh_intersections(
    verts: np.ndarray,
    faces: np.ndarray,
    origin: np.ndarray,
    direction: np.ndarray,
    max_hits: int = 64,
) -> tuple[np.ndarray, np.ndarray]:
    """All (t, face) intersections of one ray with a mesh (unsorted).

    Möller–Trumbore; used for convex-hull grasp placement (native
    counterpart of the trimesh/rtree ray casting at reference
    ``simulator/physics/grasping.py:73-75``).
    """
    verts = _as_f32(verts).reshape(-1, 3)
    faces = np.ascontiguousarray(faces, np.int32).reshape(-1, 3)
    origin = _as_f32(origin).reshape(3)
    direction = _as_f32(direction).reshape(3)
    lib = _load_library()
    if lib is not None:
        t_out = np.zeros(max_hits, np.float32)
        f_out = np.zeros(max_hits, np.int32)
        n = lib.ray_mesh_hits(
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(verts),
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(faces),
            origin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            direction.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            t_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            f_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_hits,
        )
        return t_out[:n], f_out[:n]

    # vectorized numpy Möller–Trumbore
    a = verts[faces[:, 0]]
    e1 = verts[faces[:, 1]] - a
    e2 = verts[faces[:, 2]] - a
    p = np.cross(direction[None], e2)
    det = np.einsum("fd,fd->f", e1, p)
    ok = np.abs(det) > 1e-9
    inv_det = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    s = origin[None] - a
    u = np.einsum("fd,fd->f", s, p) * inv_det
    q = np.cross(s, e1)
    v = (q @ direction) * inv_det
    t = np.einsum("fd,fd->f", e2, q) * inv_det
    hit = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= 0)
    idx = np.nonzero(hit)[0]
    return t[idx].astype(np.float32), idx.astype(np.int32)
