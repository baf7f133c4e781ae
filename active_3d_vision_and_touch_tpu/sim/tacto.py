"""DIGIT/TACTO-style colored gel renderer.

Alternative touch-signal model to :mod:`sim.touch_render`: a curved
elastomer gel illuminated by three colored LEDs around the sensor rim,
with calibration blur and sensor noise — the capability of the reference's
TACTO renderer (``simulator/rendering/tacto_renderer.py:18-309``), built on
our depth maps instead of a second pyrender scene.  Selected with
``SimConfig(tacto=True)`` (which also clamps the sensing range to 15 mm,
reference ``instance.py:46-48``).
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

# three LEDs at 120° around the rim, RGB
_LED_ANGLES = np.array([np.pi / 2, np.pi / 2 + 2 * np.pi / 3, np.pi / 2 + 4 * np.pi / 3])
_LED_COLORS = np.eye(3) * 255.0
_BACKGROUND = np.array([110.0, 120.0, 130.0])
_GEL_CURVE = 0.4  # curvature of the resting gel surface
_NOISE_STD = 2.0


class TactoRenderer:
    def __init__(self, resolution: int = 121, max_depth: float = 0.015, seed: int = 0):
        self.resolution = resolution
        self.max_depth = max_depth
        self.rng = np.random.default_rng(seed)
        lin = np.linspace(-1.0, 1.0, resolution)
        self._xx, self._yy = np.meshgrid(lin, lin)
        r2 = self._xx**2 + self._yy**2
        self._rest_gel = _GEL_CURVE * r2  # parabolic resting surface

    def render(self, depth: np.ndarray) -> np.ndarray:
        """(H, W) depth (0 = no hit) → (H, W, 3) gel image, uint8 range."""
        depth = np.asarray(depth, np.float64).copy()
        depth[(depth == 0) | (depth > self.max_depth)] = self.max_depth
        indentation = (self.max_depth - depth) / self.max_depth  # 0..1

        height = self._rest_gel + 2.0 * indentation
        zy, zx = np.gradient(height)
        normal = np.dstack([-zx, -zy, np.ones_like(height)])
        normal /= np.linalg.norm(normal, axis=2, keepdims=True)

        img = np.broadcast_to(
            _BACKGROUND, (self.resolution, self.resolution, 3)
        ).copy()
        for angle, color in zip(_LED_ANGLES, _LED_COLORS):
            led = np.array([np.cos(angle) * 1.5, np.sin(angle) * 1.5, 0.6])
            pos = np.dstack([self._xx, self._yy, height * 0.1])
            l_dir = led - pos
            l_dir /= np.linalg.norm(l_dir, axis=2, keepdims=True)
            diffuse = np.clip((normal * l_dir).sum(-1), 0, 1)
            img += diffuse[..., None] * color * 0.6

        img = np.clip(img, 0, 255)
        if cv2 is not None:
            img = cv2.GaussianBlur(img.astype(np.float32), (5, 5), 0)
        img = img + self.rng.normal(0, _NOISE_STD, img.shape)
        return np.clip(img, 0, 255)
