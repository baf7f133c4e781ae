"""Pinhole camera shared by the vision renderer and the vertex-pooling op.

One camera definition used everywhere, so the renderer that produces the
RGB observation and the model that back-projects vertices into that image
can never drift apart (the reference hard-codes the combined K·RT matrix in
the model, ``reconstruction/vision/model.py:50-67``, with a comment warning
it must match the renderer, ``simulator/rendering/vision_renderer.py:74-77``;
here both derive from this class).

The canonical scene camera sits at (-0.3, 0, 0.3) looking at the origin with
+z up, f = 221.7025 px, 256x256 image — numerically the same viewpoint as
the reference's paper camera.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def look_at_rotation(position, target=(0.0, 0.0, 0.0), up=(0.0, 0.0, 1.0)):
    """World→camera rotation whose rows are (right, down, forward)."""
    position = np.asarray(position, np.float64)
    forward = np.asarray(target, np.float64) - position
    forward = forward / np.linalg.norm(forward)
    right = np.cross(forward, np.asarray(up, np.float64))
    right = right / np.linalg.norm(right)
    down = np.cross(forward, right)
    return np.stack([right, down, forward], axis=0)


@dataclass(frozen=True)
class PinholeCamera:
    position: tuple = (-0.3, 0.0, 0.3)
    focal: float = 221.7025
    width: int = 256
    height: int = 256
    target: tuple = (0.0, 0.0, 0.0)
    up: tuple = (0.0, 0.0, 1.0)
    rotation: np.ndarray = field(init=False, repr=False)

    def __post_init__(self):
        object.__setattr__(
            self, "rotation", look_at_rotation(self.position, self.target, self.up)
        )

    @property
    def matrix(self) -> np.ndarray:
        """3x4 projection matrix K @ [R | t] mapping world homogeneous
        coordinates to (u*z, v*z, z)."""
        k = np.array(
            [
                [self.focal, 0, self.width / 2.0],
                [0, self.focal, self.height / 2.0],
                [0, 0, 1],
            ]
        )
        rt = np.concatenate(
            [self.rotation, (-self.rotation @ np.asarray(self.position))[:, None]],
            axis=1,
        )
        return (k @ rt).astype(np.float32)

    def project(self, points, xp=np):
        """(..., 3) world points → (u, v, z_cam) pixel coordinates.

        ``xp`` may be numpy or jax.numpy; the projection matrix is a
        compile-time constant either way.
        """
        m = self.matrix
        pts = xp.asarray(points)
        hom = pts @ m[:, :3].T + m[:, 3]
        z = hom[..., 2]
        z = xp.where(z == 0, 1e-1, z)
        return xp.stack([hom[..., 0] / z, hom[..., 1] / z, z], axis=-1)

    def normalized_grid(self, points, xp=np):
        """World points → [-1, 1] sampling grid for
        :func:`ops.grid_sample.bilinear_sample` (x=width coord first)."""
        uvz = self.project(points, xp=xp)
        u = uvz[..., 0] / (self.width - 1) * 2.0 - 1.0
        v = uvz[..., 1] / (self.height - 1) * 2.0 - 1.0
        return xp.stack([u, v], axis=-1)
