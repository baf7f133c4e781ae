"""Mesh-autoencoder trainer (reference ``reconstruction/autoencoder/train.py``).

The autoencoder learns to embed the frozen Deformation model's predictions:
each batch runs the (stop-gradient) deformation, the AE encodes the deformed
mesh to a latent and folds a point cloud back out, and the loss is
loss_coeff * CD(deformed-mesh samples, decoded points) — gradients reach
only the AE (reference ``autoencoder/train.py:128-160``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from active_3d_vision_and_touch_tpu.core.config import AutoencoderConfig, load_config, VisionConfig
from active_3d_vision_and_touch_tpu.models import MeshAutoEncoder
from active_3d_vision_and_touch_tpu.ops import mesh_chamfer_distance
from active_3d_vision_and_touch_tpu.train.base import ReconEngine
from active_3d_vision_and_touch_tpu.train.common import CheckpointManager
from active_3d_vision_and_touch_tpu.train.vision import VisionEngine


class AutoencoderEngine(ReconEngine):
    loss_tag = "auto_cd"

    def __init__(
        self,
        config: AutoencoderConfig | None = None,
        vision_engine: VisionEngine | None = None,
        vision_state=None,
        **kw,
    ):
        config = config or AutoencoderConfig()
        if vision_engine is None:
            # rebuild the frozen deformation model from its persisted config
            vision_config = load_config(config.vision_location, VisionConfig)
            vision_engine = VisionEngine(vision_config, log=False)
        self.vision = vision_engine
        if vision_state is None:
            template = self.vision.init_state(jax.random.PRNGKey(0))
            vision_state = CheckpointManager(
                self.vision.config.checkpoint_dir
            ).restore(template, "best")
            if vision_state is None:
                vision_state = template
        self.vision_state = vision_state

        self.model = MeshAutoEncoder(
            encoding_size=config.encoding_size,
            num_gcn_layers=config.num_gcn_layers,
            hidden_gcn_size=config.hidden_gcn_size,
            cut=config.cut,
            grid_size=config.grid_size,
        )
        self.adj = jnp.asarray(self.vision.adj_info.adj)
        self.faces = jnp.asarray(self.vision.adj_info.faces)
        self.tx = optax.adam(config.lr)
        super().__init__(config, **kw)

    def init_state(self, key):
        v = self.vision.adj_info.num_verts
        variables = self.model.init(
            key, jnp.zeros((1, v, 3)), jnp.zeros((1, v, 1)), self.adj
        )
        params = variables["params"]
        return {
            "params": params,
            "batch_stats": {},
            "opt_state": self.tx.init(params),
            "step": jnp.zeros((), jnp.int32),
        }

    def _deform(self, batch):
        verts, mask, _ = self.vision.apply(self.vision_state, batch, train=False)
        return jax.lax.stop_gradient(verts), jax.lax.stop_gradient(mask)

    def _loss(self, params, batch, key):
        verts, mask = self._deform(batch)
        pred_points, latent = self.model.apply({"params": params}, verts, mask, self.adj)
        cd = mesh_chamfer_distance(
            verts, self.faces, pred_points, key,
            num=self.config.number_points, nn=self.config.loss_nn,
        )
        return self.config.loss_coeff * jnp.mean(cd)

    def train_step(self, state, batch, key):
        loss, grads = jax.value_and_grad(self._loss)(state["params"], batch, key)
        updates, opt_state = self.tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {
            "params": params,
            "batch_stats": state["batch_stats"],
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }, loss

    def eval_step(self, state, batch, key):
        return self._loss(state["params"], batch, key)

    def encode(self, state, verts, mask):
        """Frozen latent extraction for the active policies."""
        return self.model.apply(
            {"params": state["params"]}, verts, mask, self.adj, only_encode=True
        )

    def collect_latents(self, loader):
        """(latents (N, E), names) over a loader of vision batches."""
        import numpy as np

        if not hasattr(self, "state"):
            self.build()
        encode = jax.jit(lambda v, m: self.encode(self.state, v, m))
        latents, names = [], []
        for batch in loader:
            verts, mask = self._deform(batch)
            latents.append(np.asarray(encode(verts, mask)))
            names += list(batch.get("names", range(len(verts))))
        return np.concatenate(latents, axis=0), names

    def cluster(
        self,
        loader,
        image_dir: str,
        out_dir: str,
        examples: int = 20,
        neighbors: int = 4,
        seed: int = 0,
    ):
        """Latent-space nearest-neighbor collages: for random anchors, tile
        the images of their closest distinct latents (the reference's
        qualitative AE eval, ``autoencoder/train.py:316-346``)."""
        import os

        import numpy as np
        from PIL import Image

        latents, names = self.collect_latents(loader)
        os.makedirs(out_dir, exist_ok=True)
        rng = np.random.default_rng(seed)
        anchors = rng.choice(len(latents), size=min(examples, len(latents)))
        paths = []
        for v, anchor in enumerate(anchors):
            d = ((latents - latents[anchor]) ** 2).sum(-1)
            order = np.argsort(d)
            seen, row = [], []
            for idx in order:
                obj = str(names[idx][0] if isinstance(names[idx], tuple) else names[idx])
                obj = obj.split("/")[-1]
                if obj in seen:
                    continue
                seen.append(obj)
                row.append(os.path.join(image_dir, obj + ".npy"))
                if len(row) == neighbors + 1:
                    break
            tiles = [np.load(p) for p in row]
            dim = tiles[0].shape[0]
            collage = Image.new("RGB", (dim * len(tiles), dim))
            for i, tile in enumerate(tiles):
                collage.paste(Image.fromarray(tile.astype(np.uint8)), (i * dim, 0))
            path = os.path.join(out_dir, f"valid_{v}.png")
            collage.save(path)
            paths.append(path)
        return paths
