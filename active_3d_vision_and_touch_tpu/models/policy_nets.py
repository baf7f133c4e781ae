"""Value networks for the learned active-selection policies.

- :class:`LatentValueNet`: action-mask embedding + current & first shape
  latents → one value per action.  Used by the supervised policy
  (``policies/supervised/model.py:11-58``, with its setting-dependent
  sigmoid squash) and by DDQN's latent variant
  (``policies/DDQN/model.py:16-61``, no squash).
- :class:`GraphValueNet`: mask embedding + NeRF positional + vertex-mask
  embeddings → GCN over the fused atlas → vertex max-pool → action values
  (``policies/DDQN/model.py:65-128``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from active_3d_vision_and_touch_tpu.models.gcn import (
    GCNLayer,
    MaskEncoder,
    PositionalEncoder,
)


class ActionMaskEmbed(nn.Module):
    """Embed the binary performed-actions mask."""

    out_size: int

    @nn.compact
    def __call__(self, mask: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(nn.Dense(200)(mask))
        x = nn.relu(nn.Dense(100)(x))
        return nn.Dense(self.out_size)(x)


class LatentValueNet(nn.Module):
    num_actions: int = 50
    latent_size: int = 200
    hidden_dim: int = 300
    layers: int = 5
    # squash: None | "normalize" (±1) | "img" (±3) | "wide" (±100)
    squash: str | None = None

    @nn.compact
    def __call__(
        self,
        mask: jnp.ndarray,  # (B, num_actions)
        latent: jnp.ndarray,  # (B, latent)
        first_latent: jnp.ndarray,  # (B, latent)
    ) -> jnp.ndarray:
        a = ActionMaskEmbed(self.latent_size)(mask)
        x = jnp.concatenate([a, latent, first_latent], axis=-1)
        for _ in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim)(x))
        x = nn.Dense(self.num_actions)(x)
        if self.squash == "normalize":
            return nn.sigmoid(x) * 2.0 - 1.0
        if self.squash == "img":
            return nn.sigmoid(x) * 6.0 - 3.0
        if self.squash == "wide":
            return nn.sigmoid(x) * 200.0 - 100.0
        return x


class GraphValueNet(nn.Module):
    num_actions: int = 50
    hidden_dim: int = 100
    layers: int = 5
    cut: float = 0.33
    feature_size: int = 100

    @nn.compact
    def __call__(
        self,
        mask: jnp.ndarray,  # (B, num_actions)
        mesh: jnp.ndarray,  # (B, V, 4) verts + mask code
        adj: jnp.ndarray,  # (V, V)
    ) -> jnp.ndarray:
        verts = mesh[..., :3]
        vmask = mesh[..., 3:]
        a = ActionMaskEmbed(self.feature_size)(mask)  # (B, F)
        pos = PositionalEncoder(self.feature_size)(verts)
        m = MaskEncoder(self.feature_size)(vmask)
        a = jnp.broadcast_to(a[:, None, :], pos.shape[:2] + (self.feature_size,))
        x = jnp.concatenate([a, pos, m], axis=-1)
        for i in range(self.layers):
            last = i == self.layers - 1
            x = GCNLayer(
                out_features=self.num_actions if last else self.hidden_dim,
                cut=self.cut,
                do_cut=not last,
            )(x, adj)
            if not last:
                x = nn.relu(x)
        return jnp.max(x, axis=1)  # (B, num_actions)
