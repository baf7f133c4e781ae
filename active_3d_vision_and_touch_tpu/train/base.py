"""Engine base: the train/validate/checkpoint/early-stop loop shared by all
reconstruction trainers (the "L6 experiment engine" pattern of the
reference, e.g. ``reconstruction/vision/train.py:24-284``)."""

from __future__ import annotations

import time

import jax
import numpy as np

from active_3d_vision_and_touch_tpu.core.config import save_config
from active_3d_vision_and_touch_tpu.parallel import (
    data_parallel_mesh,
    replicate,
    shard_batch,
)
from active_3d_vision_and_touch_tpu.train.common import (
    CheckpointManager,
    EarlyStop,
    MetricsWriter,
)


class ReconEngine:
    """Subclasses define ``init_state``, ``train_step`` and ``eval_step``
    (all jit-compatible) plus ``loss_tag``."""

    loss_tag = "loss"

    def __init__(self, config, mesh=None, log: bool = True):
        self.config = config
        self.mesh = mesh if mesh is not None else data_parallel_mesh()
        self.key = jax.random.PRNGKey(config.seed)
        self.epoch = 0
        self.ckpt = CheckpointManager(config.checkpoint_dir)
        self.early_stop = EarlyStop(config.patience)
        self.writer = (
            MetricsWriter(config.tensorboard_dir, config.exp_id) if log else None
        )
        if not config.eval:
            save_config(config.checkpoint_dir, config)
        self._jit_train = None
        self._jit_eval = None

    # -- to be provided by subclasses -------------------------------------
    def init_state(self, key):
        raise NotImplementedError

    def train_step(self, state, batch, key):
        raise NotImplementedError

    def eval_step(self, state, batch, key):
        raise NotImplementedError

    # ----------------------------------------------------------------------
    def _step_key(self, step: int):
        return jax.random.fold_in(self.key, step)

    def build(self):
        init_key, self.key = jax.random.split(self.key)
        state = self.init_state(init_key)
        state = replicate(state, self.mesh)
        restored = self.ckpt.restore(state, "recent")
        if restored is not None:
            state = replicate(restored, self.mesh)
            meta = self.ckpt.meta() or {}
            self.epoch = int(meta.get("epoch", 0))
            if "early_stop" in meta:
                self.early_stop.restore(meta["early_stop"])
        self.state = state
        self._jit_train = jax.jit(self.train_step, donate_argnums=0)
        self._jit_eval = jax.jit(self.eval_step)
        return state

    def run_epoch(self, loader, train: bool = True) -> float:
        losses = []
        step_base = self.epoch * 100_000
        for i, batch in enumerate(loader):
            # metadata (names) stays on host; jit steps take arrays only
            batch = {k: v for k, v in batch.items() if k != "names"}
            batch = shard_batch(batch, self.mesh)
            key = self._step_key(step_base + i)
            if train:
                self.state, loss = self._jit_train(self.state, batch, key)
            else:
                loss = self._jit_eval(self.state, batch, key)
            # keep the loss on device: fetching here would sync every step
            # (~20 ms device→host fence through the axon tunnel) and stall
            # the dispatch pipeline behind the host loader
            losses.append(loss)
        if not losses:
            return 0.0
        return float(np.mean([np.asarray(l) for l in losses]))

    def fit(self, train_loader_fn, valid_loader_fn, epochs: int | None = None):
        """Full training run; loaders are zero-arg callables returning fresh
        batch iterables each epoch.  Returns the best validation loss."""
        if not hasattr(self, "state"):
            self.build()
        epochs = epochs if epochs is not None else self.config.epochs
        for epoch in range(self.epoch, epochs):
            self.epoch = epoch
            t0 = time.time()
            train_loss = self.run_epoch(train_loader_fn(), train=True)
            valid_loss = self.run_epoch(valid_loader_fn(), train=False)
            if self.writer:
                self.writer.scalar(f"train_{self.loss_tag}", train_loss, epoch)
                self.writer.scalar(f"valid_{self.loss_tag}", valid_loss, epoch)
                self.writer.scalar("epoch_seconds", time.time() - t0, epoch)
            improved = self.early_stop.update(valid_loss)
            meta = {"epoch": epoch + 1, "early_stop": self.early_stop.state()}
            self.ckpt.save(self.state, "recent", meta=meta)
            if improved:
                self.ckpt.save(self.state, "best")
            if self.early_stop.should_stop:
                break
        return self.early_stop.best

    def evaluate(self, loader) -> float:
        if not hasattr(self, "state"):
            self.build()
        restored = self.ckpt.restore(self.state, "best")
        if restored is not None:
            self.state = replicate(restored, self.mesh)
        return self.run_epoch(loader, train=False)
