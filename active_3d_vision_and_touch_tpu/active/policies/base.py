"""Policy-engine base: frozen-model loading, env construction, loaders,
result persistence (the shared scaffolding of the reference's 8 policy
engines, e.g. ``policies/baselines/even.py:18-46``)."""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from active_3d_vision_and_touch_tpu.active.env import ActiveTouchEnv
from active_3d_vision_and_touch_tpu.core.config import (
    AutoencoderConfig,
    PolicyConfig,
    TouchConfig,
    VisionConfig,
    load_config,
    save_config,
)
from active_3d_vision_and_touch_tpu.data.datasets import ActiveDataset, Loader
from active_3d_vision_and_touch_tpu.models.autoencoder import MeshAutoEncoder
from active_3d_vision_and_touch_tpu.train.common import CheckpointManager


def load_frozen_models(config: PolicyConfig):
    """Rebuild the frozen touch/vision(/auto) models from their persisted
    configs + best checkpoints (reference ``environment.py:107-140``)."""
    from active_3d_vision_and_touch_tpu.train.touch import TouchEngine
    from active_3d_vision_and_touch_tpu.train.vision import VisionEngine

    touch_cfg = load_config(config.touch_location, TouchConfig)
    touch_cfg.eval = True
    touch_engine = TouchEngine(touch_cfg, log=False)
    template = touch_engine.init_state(jax.random.PRNGKey(0))
    touch_state = (
        CheckpointManager(config.touch_location).restore(template, "best") or template
    )

    vision_cfg = load_config(config.vision_location, VisionConfig)
    vision_cfg.eval = True
    # the frozen vision checkpoint defines the reconstruction architecture
    # and setting; sync those fields into the policy config so the env
    # rebuilds the exact model the params were trained for (a CLI flag
    # mismatch otherwise fails deep inside flax apply)
    for field in (
        "use_img", "use_touch", "finger", "num_grasps", "num_gcn_layers",
        "hidden_gcn_size", "cut", "num_cnn_blocks", "layers_per_block",
        "cnn_kernel",
    ):
        setattr(config, field, getattr(vision_cfg, field))
    vision_engine = VisionEngine(vision_cfg, log=False)
    template = vision_engine.init_state(jax.random.PRNGKey(0))
    vision_state = (
        CheckpointManager(config.vision_location).restore(template, "best") or template
    )

    auto_model, auto_state = None, None
    if config.use_latent:
        auto_cfg = load_config(config.auto_location, AutoencoderConfig)
        auto_model = MeshAutoEncoder(
            encoding_size=auto_cfg.encoding_size,
            num_gcn_layers=auto_cfg.num_gcn_layers,
            hidden_gcn_size=auto_cfg.hidden_gcn_size,
            cut=auto_cfg.cut,
            grid_size=auto_cfg.grid_size,
        )
        v = vision_engine.adj_info.num_verts
        variables = auto_model.init(
            jax.random.PRNGKey(0),
            np.zeros((1, v, 3), np.float32),
            np.zeros((1, v, 1), np.float32),
            vision_engine.adj,
        )
        # the saved autoencoder checkpoint is a full train state (params +
        # optimizer + step); restore raw and keep only the frozen params
        raw = CheckpointManager(config.auto_location).restore_raw("best")
        auto_state = {
            "params": raw["params"] if raw is not None else variables["params"]
        }
    return touch_state, vision_state, auto_model, auto_state


class PolicyEngine:
    name = "policy"

    def __init__(
        self,
        config: PolicyConfig,
        data_root: str | None = None,
        env: ActiveTouchEnv | None = None,
    ):
        self.config = config
        self.data_root = data_root
        os.makedirs(config.checkpoint_dir, exist_ok=True)
        os.makedirs(config.results_dir, exist_ok=True)
        if not config.eval:
            save_config(config.checkpoint_dir, config)
        if env is None:
            touch_state, vision_state, auto_model, auto_state = load_frozen_models(
                config
            )
            env = ActiveTouchEnv(
                config, touch_state, vision_state, auto_state, auto_model
            )
        self.env = env

    def loader(self, split: str):
        ds = ActiveDataset(
            self.data_root,
            split=split,
            use_img=self.config.use_img,
            number_points=self.config.number_points,
            env_batch_size=self.config.env_batch_size,
            limit=400 if self.config.limit_data else None,
        )
        return Loader(
            ds,
            batch_size=self.config.env_batch_size,
            shuffle=split == "RL_train",
            drop_last=True,
        )

    def save_result(self, result, tag: str = None) -> None:
        if tag is None:
            tag = getattr(self.config, "result_tag", "eval")
        path = os.path.join(self.config.results_dir, f"{tag}.json")
        with open(path, "w") as f:
            json.dump(result.summary(), f, indent=2)
        np.savez(
            os.path.join(self.config.results_dir, f"{tag}_trajectories.npz"),
            scores=result.scores,
            actions=result.actions,
        )
        if self.config.visualize:
            from active_3d_vision_and_touch_tpu.utils.viz import visualize_actions

            visualize_actions(
                self.config.results_dir,
                result.actions,
                self.config.num_actions,
                use_img=self.config.use_img,
            )
