"""Positional (NeRF-style) encoding of vertex coordinates.

Sin/cos features at 10 frequencies plus the raw coordinates → 63-d vector
per 3-d point.  Frequencies are linear multiples (pi, 2pi, 4pi? no —
pi, 2pi*1, 2pi*2, ... 2pi*9), reproducing the reference's quirky linear
frequency ladder (``reconstruction/vision/model.py:380-391``) rather than
the usual power-of-two octaves.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def nerf_embedding(points: jnp.ndarray, num_freqs: int = 10) -> jnp.ndarray:
    """(..., D) points → (..., D * (2*num_freqs + 1)) features.

    Feature layout: [sin(f0 p), cos(f0 p), ..., sin(f9 p), cos(f9 p), p]
    with f0 = pi and fi = 2*pi*i for i >= 1.
    """
    feats = []
    for i in range(num_freqs):
        freq = np.pi if i == 0 else 2.0 * np.pi * i
        feats.append(jnp.sin(freq * points))
        feats.append(jnp.cos(freq * points))
    feats.append(points)
    return jnp.concatenate(feats, axis=-1)
