"""Touch-chart prediction: tactile image → deformed 25-vertex chart.

A small CNN encodes the 121x121 simulated gel image; an MLP decodes 25
vertex offsets applied to the canonical touch chart; the chart is then
rigidly moved into the world frame of the sensing fingertip.  Functional
equivalent of the reference touch model
(``reconstruction/touch/model.py:10-74``), NHWC and flax-native.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class DoubleConv(nn.Module):
    """conv(s2) → BN → ReLU → conv → BN → ReLU → conv [→ BN → ReLU]."""

    features: int
    last: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = lambda: nn.BatchNorm(use_running_average=not train)  # noqa: E731
        conv = lambda s: nn.Conv(  # noqa: E731
            self.features, (5, 5), strides=(s, s), padding=((2, 2), (2, 2))
        )
        x = nn.relu(norm()(conv(2)(x)))
        x = nn.relu(norm()(conv(1)(x)))
        x = conv(1)(x)
        if not self.last:
            x = nn.relu(norm()(x))
        return x


class TouchChartEncoder(nn.Module):
    """121x121x3 gel image → (25, 3) chart vertices in the world frame."""

    num_verts: int = 25

    @nn.compact
    def predict_verts(self, touch: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = touch  # (B, 121, 121, 3) NHWC
        for i, feats in enumerate((16, 32, 32, 64, 128, 128)):
            x = DoubleConv(features=feats, last=(i == 5))(x, train=train)
        x = x.reshape(x.shape[0], -1)  # (B, 2*2*128) = (B, 512)
        x = nn.relu(nn.Dense(256)(x))
        x = nn.relu(nn.Dense(128)(x))
        x = nn.Dense(self.num_verts * 3)(x)
        return x.reshape(-1, self.num_verts, 3)

    def __call__(
        self,
        touch: jnp.ndarray,  # (B, 121, 121, 3) in [0, 1]
        ref_pos: jnp.ndarray,  # (B, 3) fingertip position
        ref_rot: jnp.ndarray,  # (B, 3, 3) fingertip rotation
        chart_verts: jnp.ndarray,  # (25, 3) canonical chart
        train: bool = False,
    ) -> jnp.ndarray:
        offsets = self.predict_verts(touch, train)
        verts = chart_verts[None] + offsets  # (B, 25, 3)
        # rigid transform into the sensor frame: R @ v + t
        verts = jnp.einsum("bij,bvj->bvi", ref_rot, verts) + ref_pos[:, None, :]
        return verts
