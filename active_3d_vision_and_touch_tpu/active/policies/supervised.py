"""Supervised value-regression policy.

One value network per budget step, trained sequentially: roll to the step
with the already-trained models (argmin of predicted values, previously
chosen actions pinned to +inf), then regress the values of random probe
actions onto the observed score improvements measured with
``env.check_step`` (reference ``policies/supervised/train.py:103-210``).
Requires use_latent.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from active_3d_vision_and_touch_tpu.active.policies.base import PolicyEngine
from active_3d_vision_and_touch_tpu.active.policies.rollout import run_rollouts
from active_3d_vision_and_touch_tpu.models.policy_nets import LatentValueNet
from active_3d_vision_and_touch_tpu.train.common import CheckpointManager


class SupervisedEngine(PolicyEngine):
    name = "supervised"

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        c = self.config
        assert c.use_latent, "supervised policy requires latent observations"
        if c.normalize:
            squash = "normalize"
        elif c.use_img:
            squash = "img"
        else:
            squash = "wide"
        latent = int(np.asarray(self._latent_size()))
        self.model = LatentValueNet(
            num_actions=c.num_actions,
            latent_size=latent,
            hidden_dim=c.hidden_dim,
            layers=c.layers,
            squash=squash,
        )
        self.tx = optax.adam(c.lr)
        key = jax.random.PRNGKey(c.seed)
        dummy = (
            jnp.zeros((1, c.num_actions)),
            jnp.zeros((1, latent)),
            jnp.zeros((1, latent)),
        )
        self.params = [
            self.model.init(jax.random.fold_in(key, i), *dummy)["params"]
            for i in range(c.budget)
        ]
        self.opt_states = [self.tx.init(p) for p in self.params]
        self._apply = jax.jit(
            lambda p, mask, lat, first: self.model.apply({"params": p}, mask, lat, first)
        )
        self._grad = jax.jit(jax.value_and_grad(self._loss))
        self.ckpt = CheckpointManager(self.config.checkpoint_dir)
        restored = self.ckpt.restore(self.params, "recent")
        if restored is not None:
            self.params = restored

    def _latent_size(self) -> int:
        if self.env.auto_model is not None:
            return self.env.auto_model.encoding_size
        return 200

    def _values(self, step: int, obs, prev_actions: list[np.ndarray]) -> np.ndarray:
        v = np.array(
            self._apply(
                self.params[step],
                jnp.asarray(obs["mask"]),
                jnp.asarray(obs["latent"]),
                jnp.asarray(obs["first_latent"]),
            )
        )
        pin = 1e10 if self.config.supervised_select == "argmin" else -1e10
        for acts in prev_actions:
            for e, a in enumerate(acts):
                v[e, int(a)] = pin  # never repeat an action
        return v

    def _select(self, step: int, obs, prev_actions: list[np.ndarray]) -> np.ndarray:
        """Pick one action per env from the step's value model.  Default
        "argmin" mirrors the reference's selection (supervised/train.py:
        125,195) even though the regression target is an improvement;
        "argmax" is the sign-consistent rule (see PolicyConfig)."""
        v = self._values(step, obs, prev_actions)
        if self.config.supervised_select == "argmax":
            return np.argmax(v, axis=1)
        return np.argmin(v, axis=1)

    def _loss(self, params, mask, latent, first_latent, probe_actions, target):
        values = self.model.apply({"params": params}, mask, latent, first_latent)
        picked = jnp.take_along_axis(values, probe_actions, axis=1)
        return jnp.mean((target - picked) ** 2)

    def train_step_level(
        self, step: int, max_batches: int | None = None, probes: int | None = None
    ) -> float:
        """Train the value model for one budget step over the train set."""
        c = self.config
        probes = probes or c.training_actions
        rng = np.random.default_rng(c.seed + step)
        losses = []
        for v, batch in enumerate(self.loader("RL_train")):
            if max_batches is not None and v >= max_batches:
                break
            try:
                obs = self.env.reset(batch)
            except Exception as e:  # noqa: BLE001 — poison-object guard
                # one degenerate object must not abort a training sweep
                # (reference supervised/train.py:112-114 does the same)
                print(f"skipping batch {v} ({batch.get('names')}): {e}")
                continue
            prev_actions: list[np.ndarray] = []
            for i in range(step):
                acts = self._select(i, obs, prev_actions)
                obs, _, _ = self.env.step(acts)
                prev_actions.append(acts)

            probe = rng.integers(c.num_actions, size=(c.env_batch_size, probes))
            scores = self.env.score_candidates(probe)
            first = obs["first_score"][:, None]
            if c.normalize:
                targets = ((first - scores) / first).astype(np.float32)
            else:
                targets = (first - scores).astype(np.float32)

            loss, grads = self._grad(
                self.params[step],
                jnp.asarray(obs["mask"]),
                jnp.asarray(obs["latent"]),
                jnp.asarray(obs["first_latent"]),
                jnp.asarray(probe),
                jnp.asarray(targets),
            )
            updates, self.opt_states[step] = self.tx.update(
                grads, self.opt_states[step], self.params[step]
            )
            self.params[step] = optax.apply_updates(self.params[step], updates)
            losses.append(float(loss))
        self.ckpt.save(self.params, "recent")
        return float(np.mean(losses)) if losses else float("nan")

    def _validate_step(self, step: int, max_batches: int = 4) -> float:
        """Mean %CD remaining after rolling steps 0..step on the valid
        split — the reference's per-step model-selection metric
        (``supervised/train.py:216-258``: scores[:, -1] / scores[:, 0],
        best checkpoint kept, patience on epochs without improvement)."""
        ratios = []
        for v, batch in enumerate(self.loader("valid")):
            if v >= max_batches:
                break
            try:
                obs = self.env.reset(batch)
            except Exception as e:  # noqa: BLE001 — poison-object guard
                print(f"skipping valid batch {v}: {e}")
                continue
            first = obs["score"].copy()
            prev: list[np.ndarray] = []
            for i in range(step + 1):
                acts = self._select(i, obs, prev)
                obs, _, _ = self.env.step(acts)
                prev.append(acts)
            ratios.append(float(np.mean(obs["score"] / first)))
        return float(np.mean(ratios)) if ratios else float("inf")

    def train(
        self,
        max_batches_per_step: int | None = None,
        epochs: int | None = None,
        patience: int = 2,
    ):
        """Sequential per-step training with validation-based model
        selection (reference ``supervised/train.py:63-79``: up to 3000
        epochs / patience 25 per step; scaled to this budget via
        ``epochs``).  epochs=1 skips validation (legacy single-sweep)."""
        epochs = epochs if epochs is not None else self.config.supervised_epochs
        for step in range(self.config.budget):
            if epochs <= 1:
                self.train_step_level(step, max_batches=max_batches_per_step)
                continue
            best, best_params, since = float("inf"), self.params[step], 0
            for epoch in range(epochs):
                loss = self.train_step_level(step, max_batches=max_batches_per_step)
                score = self._validate_step(step)
                print(
                    f"supervised step {step} epoch {epoch}: "
                    f"loss {loss:.4f} valid %CD {score:.4f}", flush=True,
                )
                if score < best:
                    best, best_params, since = score, self.params[step], 0
                else:
                    since += 1
                    if since >= patience:
                        break
            self.params[step] = best_params
            self.ckpt.save(self.params, "recent")

    def evaluate(self, split: str = "test", max_batches=None):
        prev: list[np.ndarray] = []

        def reset_prev():
            prev.clear()

        def select(obs, step):
            acts = self._select(step, obs, prev)
            prev.append(acts)
            return acts

        result = run_rollouts(
            self.env,
            self.loader(split),
            select,
            self.config.budget,
            on_episode_start=reset_prev,
            max_batches=max_batches,
        )
        self.save_result(result)
        return result
