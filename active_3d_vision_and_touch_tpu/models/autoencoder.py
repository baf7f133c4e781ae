"""Mesh autoencoder: predicted mesh → 200-d latent → folded point cloud.

A GCN encoder runs over the (deformed) chart-atlas mesh, max-pools over
vertices and projects to a compact latent; a FoldingNet decoder folds an
80x80 2-D grid through the latent twice to reproduce a 6400-point cloud.
The latent is what the active policies consume as their shape state.

Capability-parity with the reference autoencoder
(``reconstruction/autoencoder/model.py:16-264``), flax-native (the torch
1x1 Conv1d folds become Dense layers applied pointwise — identical math,
MXU-friendly layout).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from active_3d_vision_and_touch_tpu.models.gcn import (
    GCNLayer,
    MaskEncoder,
    PositionalEncoder,
)


class GCNEncoder(nn.Module):
    """GCN stack → per-vertex features → max-pool → MLP → latent."""

    num_layers: int
    hidden_size: int
    encoding_size: int
    cut: float = 0.33

    @nn.compact
    def __call__(self, features: jnp.ndarray, adj: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            features = GCNLayer(
                out_features=self.hidden_size,
                cut=self.cut,
                do_cut=i < self.num_layers - 1,
            )(features, adj)
            if i < self.num_layers - 1:
                features = nn.relu(features)
        pooled = jnp.max(features, axis=1)  # vertex max-pool
        x = nn.relu(nn.Dense(500)(pooled))
        x = nn.relu(nn.Dense(400)(x))
        x = nn.relu(nn.Dense(300)(x))
        return nn.Dense(self.encoding_size)(x)


def folding_grid(grid_size: int = 80) -> np.ndarray:
    """(grid_size^2, 2) planar grid in [-0.5, 0.5]^2."""
    lin = np.linspace(-0.5, 0.5, grid_size, dtype=np.float32)
    gx, gy = np.meshgrid(lin, lin)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


class FoldingDecoder(nn.Module):
    """Two folding passes of a planar grid conditioned on the latent."""

    grid_size: int = 80

    @nn.compact
    def __call__(self, latent: jnp.ndarray) -> jnp.ndarray:
        code = nn.Dense(512)(latent)  # (B, 512)
        n = self.grid_size**2
        code = jnp.broadcast_to(code[:, None, :], (code.shape[0], n, 512))
        grid = jnp.asarray(folding_grid(self.grid_size))
        grid = jnp.broadcast_to(grid[None], (code.shape[0], n, 2))

        # fold 1: (code | grid) → xyz
        x = jnp.concatenate([code, grid], axis=-1)
        x = nn.relu(nn.Dense(512)(x))
        x = nn.relu(nn.Dense(512)(x))
        fold1 = nn.Dense(3)(x)
        # fold 2: (code | fold1) → xyz
        x = jnp.concatenate([code, fold1], axis=-1)
        x = nn.relu(nn.Dense(512)(x))
        x = nn.relu(nn.Dense(512)(x))
        return nn.Dense(3)(x)  # (B, n, 3)


class MeshAutoEncoder(nn.Module):
    """verts+mask → latent (and optionally a decoded point cloud)."""

    encoding_size: int = 200
    num_gcn_layers: int = 20
    hidden_gcn_size: int = 300
    cut: float = 0.33
    feature_size: int = 50
    grid_size: int = 80

    def setup(self):
        self.positional = PositionalEncoder(self.feature_size)
        self.mask_enc = MaskEncoder(self.feature_size)
        self.encoder = GCNEncoder(
            self.num_gcn_layers, self.hidden_gcn_size, self.encoding_size, self.cut
        )
        self.decoder = FoldingDecoder(self.grid_size)

    def encode(
        self, verts: jnp.ndarray, mask: jnp.ndarray, adj: jnp.ndarray
    ) -> jnp.ndarray:
        features = self.positional(verts) + self.mask_enc(mask)
        return self.encoder(features, adj)

    def __call__(
        self,
        verts: jnp.ndarray,
        mask: jnp.ndarray,
        adj: jnp.ndarray,
        only_encode: bool = False,
    ):
        latent = self.encode(verts, mask, adj)
        if only_encode:
            return latent
        return self.decoder(latent), latent
