"""Bilinear sampling of image feature maps at projected vertex locations.

TPU-native replacement for ``torch.nn.functional.grid_sample`` with
``align_corners=True`` and zero padding, as used by the reference's vertex
feature pooling (``reconstruction/vision/model.py:70-103``).  Implemented as
vectorized gathers — XLA fuses the 4-corner gather + lerp into one pass.

Layout is NHWC (TPU-native), not NCHW.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(feat: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample ``feat`` (B, H, W, C) at ``grid`` (B, P, 2) normalized coords.

    grid[..., 0] is the x (width) coordinate, grid[..., 1] the y (height)
    coordinate, both in [-1, 1]; align_corners semantics (-1 → pixel 0,
    +1 → pixel size-1).  Out-of-bounds corners contribute zero.
    Returns (B, P, C).
    """
    b, h, w, c = feat.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (h - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    out = jnp.zeros(grid.shape[:2] + (c,), feat.dtype)
    batch_idx = jnp.arange(b)[:, None]
    for dy, dx, wgt in (
        (0, 0, (1 - wy) * (1 - wx)),
        (0, 1, (1 - wy) * wx),
        (1, 0, wy * (1 - wx)),
        (1, 1, wy * wx),
    ):
        yi = y0 + dy
        xi = x0 + dx
        valid = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = feat[batch_idx, yc, xc]  # (B, P, C)
        out = out + jnp.where(valid[..., None], wgt[..., None] * vals, 0.0)
    return out
