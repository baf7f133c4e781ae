"""Vision deformation trainer (reference ``reconstruction/vision/train.py``).

Batches: ``img`` (B, 256, 256, 3) [only when use_img], ``gt_points``
(B, number_points, 3), ``touch_charts`` (B, num_grasps, [num_fingers,]
25, 4) [only when use_touch].  Loss: loss_coeff * CD(deformed mesh sampled
at number_points, gt_points), 3-repeat averaged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from active_3d_vision_and_touch_tpu.core import build_adj_info, vision_charts
from active_3d_vision_and_touch_tpu.core.config import VisionConfig
from active_3d_vision_and_touch_tpu.models import Deformation, prepare_charts
from active_3d_vision_and_touch_tpu.ops import mesh_chamfer_distance
from active_3d_vision_and_touch_tpu.train.base import ReconEngine


def build_deformation(config: VisionConfig):
    """(model, adj_info, initial_mesh jnp) for a given config."""
    atlas = vision_charts()
    adj_info = build_adj_info(
        atlas,
        use_touch=config.use_touch,
        num_fingers=config.num_fingers,
        num_grasps=config.num_grasps,
    )
    model = Deformation(
        use_img=config.use_img,
        use_touch=config.use_touch,
        touch_global=config.touch_global,
        touch_plane=config.touch_plane,
        num_gcn_layers=config.num_gcn_layers,
        hidden_gcn_size=config.hidden_gcn_size,
        cut=config.cut,
        num_cnn_blocks=config.num_cnn_blocks,
        layers_per_block=config.layers_per_block,
        cnn_kernel=config.cnn_kernel,
    )
    return model, adj_info, jnp.asarray(atlas.verts)


class VisionEngine(ReconEngine):
    loss_tag = "vision_cd"

    def __init__(self, config: VisionConfig | None = None, **kw):
        config = config or VisionConfig()
        self.model, self.adj_info, self.initial_mesh = build_deformation(config)
        self.adj = jnp.asarray(self.adj_info.adj)
        self.original_adj = jnp.asarray(self.adj_info.original)
        self.faces = jnp.asarray(self.adj_info.faces)
        self.tx = optax.adam(config.lr)
        super().__init__(config, **kw)

    def _dummy_batch(self, b: int = 1):
        c = self.config
        batch = {"gt_points": jnp.zeros((b, 64, 3))}
        if c.use_img:
            batch["img"] = jnp.zeros((b, 256, 256, 3))
        if c.use_touch:
            shape = (
                (b, c.num_grasps, 25, 4)
                if c.finger
                else (b, c.num_grasps, 4, 25, 4)
            )
            batch["touch_charts"] = jnp.zeros(shape)
        return batch

    def _charts(self, batch, b):
        return prepare_charts(
            batch.get("touch_charts"),
            self.initial_mesh,
            b,
            use_touch=self.config.use_touch,
        )

    def init_state(self, key):
        batch = self._dummy_batch()
        charts = self._charts(batch, 1)
        variables = self.model.init(
            key, batch.get("img"), charts, self.adj, self.original_adj
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return {
            "params": params,
            "batch_stats": batch_stats,
            "opt_state": self.tx.init(params),
            "step": jnp.zeros((), jnp.int32),
        }

    def apply(self, state, batch, train=False):
        b = batch["gt_points"].shape[0]
        charts = self._charts(batch, b)
        variables = {"params": state["params"]}
        if state["batch_stats"]:
            variables["batch_stats"] = state["batch_stats"]
        out = self.model.apply(
            variables,
            batch.get("img"),
            charts,
            self.adj,
            self.original_adj,
            train=train,
            mutable=["batch_stats"] if train else False,
        )
        if train:
            (verts, mask), updates = out
            return verts, mask, updates.get("batch_stats", state["batch_stats"])
        verts, mask = out
        return verts, mask, state["batch_stats"]

    def _loss(self, params, batch_stats, batch, key, train):
        state = {"params": params, "batch_stats": batch_stats}
        verts, _, new_stats = self.apply(state, batch, train=train)
        cd = mesh_chamfer_distance(
            verts,
            self.faces,
            batch["gt_points"],
            key,
            num=self.config.number_points,
            nn=self.config.loss_nn,
        )
        return self.config.loss_coeff * jnp.mean(cd), new_stats

    def train_step(self, state, batch, key):
        (loss, new_stats), grads = jax.value_and_grad(self._loss, has_aux=True)(
            state["params"], state["batch_stats"], batch, key, True
        )
        updates, opt_state = self.tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {
            "params": params,
            "batch_stats": new_stats,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }, loss

    def eval_step(self, state, batch, key):
        loss, _ = self._loss(state["params"], state["batch_stats"], batch, key, False)
        return loss

    def evaluate_detailed(self, loader, visualize_dir: str | None = None,
                          max_visualize: int = 8):
        """Per-object CD over a loader, optionally rendering the first few
        predictions (the reference's eval + --visualize path,
        ``vision/train.py:159-208``).  Returns (mean_cd, per_object list)."""
        import numpy as np

        from active_3d_vision_and_touch_tpu.ops import mesh_chamfer_distance

        if not hasattr(self, "state"):
            self.build()

        def detailed(state, batch, key):
            verts, mask, _ = self.apply(state, batch, train=False)
            cd = mesh_chamfer_distance(
                verts, self.faces, batch["gt_points"], key,
                num=self.config.number_points,
            )
            return verts, self.config.loss_coeff * cd

        jit_detailed = jax.jit(detailed)
        per_object, rendered = [], 0
        for i, batch in enumerate(loader):
            names = batch.get("names", None)
            arrays = {k: v for k, v in batch.items() if k != "names"}
            verts, cds = jit_detailed(self.state, arrays, self._step_key(i))
            cds = np.asarray(cds)
            for j, cd in enumerate(cds):
                per_object.append(
                    {"name": str(names[j][0]) if names else str(j), "cd": float(cd)}
                )
            if visualize_dir and rendered < max_visualize:
                from active_3d_vision_and_touch_tpu.utils.viz import (
                    visualize_prediction,
                )

                take = min(len(cds), max_visualize - rendered)
                visualize_prediction(
                    visualize_dir,
                    np.asarray(verts)[:take],
                    np.asarray(self.faces),
                    [p["name"] for p in per_object[-len(cds):][:take]],
                    gt_points=np.asarray(arrays["gt_points"])[:take],
                )
                rendered += take
        mean_cd = float(np.mean([p["cd"] for p in per_object])) if per_object else float("nan")
        return mean_cd, per_object
