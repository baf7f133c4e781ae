"""Touch-chart trainer (reference ``reconstruction/touch/train.py``).

Batches: ``sim_touch`` (B, 121, 121, 3) in [0,1], ``ref_pos`` (B, 3),
``ref_rot`` (B, 3, 3), ``samples`` (B, num_samples, 3) local ground-truth
touch point clouds.  Loss: loss_coeff * CD(predicted chart mesh sampled at
``num_samples`` points, samples), 3-repeat averaged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from active_3d_vision_and_touch_tpu.core import touch_chart
from active_3d_vision_and_touch_tpu.core.config import TouchConfig
from active_3d_vision_and_touch_tpu.models import TouchChartEncoder
from active_3d_vision_and_touch_tpu.ops import mesh_chamfer_distance
from active_3d_vision_and_touch_tpu.train.base import ReconEngine


class TouchEngine(ReconEngine):
    loss_tag = "touch_cd"

    def __init__(self, config: TouchConfig | None = None, **kw):
        config = config or TouchConfig()
        chart = touch_chart()
        self.chart_verts = jnp.asarray(chart.verts)
        self.chart_faces = jnp.asarray(chart.faces)
        self.model = TouchChartEncoder()
        self.tx = optax.adam(config.lr)
        super().__init__(config, **kw)

    def init_state(self, key):
        dummy = (
            jnp.zeros((1, 121, 121, 3)),
            jnp.zeros((1, 3)),
            jnp.zeros((1, 3, 3)),
            self.chart_verts,
        )
        variables = self.model.init(key, *dummy)
        return {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
            "opt_state": self.tx.init(variables["params"]),
            "step": jnp.zeros((), jnp.int32),
        }

    def _loss(self, params, batch_stats, batch, key, train):
        variables = {"params": params, "batch_stats": batch_stats}
        out = self.model.apply(
            variables,
            batch["sim_touch"],
            batch["ref_pos"],
            batch["ref_rot"],
            self.chart_verts,
            train=train,
            mutable=["batch_stats"] if train else False,
        )
        verts, new_stats = out if train else (out, {"batch_stats": batch_stats})
        cd = mesh_chamfer_distance(
            verts,
            self.chart_faces,
            batch["samples"],
            key,
            num=self.config.num_samples,
            nn=self.config.loss_nn,
        )
        return self.config.loss_coeff * jnp.mean(cd), new_stats["batch_stats"]

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

    def predict(self, state, sim_touch, ref_pos, ref_rot):
        """Frozen inference used by the active environment."""
        variables = {"params": state["params"], "batch_stats": state["batch_stats"]}
        return self.model.apply(
            variables, sim_touch, ref_pos, ref_rot, self.chart_verts
        )
