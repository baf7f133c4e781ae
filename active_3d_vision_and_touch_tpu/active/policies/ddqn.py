"""Double-DQN policy over latent or mesh observations.

ε-greedy actor with performed-action penalization, tiny replay buffer,
double-Q target network, reward normalization by first/current score, and
gradient clipping — the reference's exact algorithmic shape
(``policies/DDQN/ddqn.py:15-143`` + ``train.py:102-172``), with the update
as one jit'd step.  Quirks preserved deliberately: default γ=0,
mem_capacity=300 (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from active_3d_vision_and_touch_tpu.active.policies.base import PolicyEngine
from active_3d_vision_and_touch_tpu.active.policies.baselines import RandomSampler
from active_3d_vision_and_touch_tpu.active.policies.rollout import run_rollouts
from active_3d_vision_and_touch_tpu.active.replay import ReplayMemory
from active_3d_vision_and_touch_tpu.models.policy_nets import (
    GraphValueNet,
    LatentValueNet,
)
from active_3d_vision_and_touch_tpu.train.common import CheckpointManager

# per-setting net sizes when running from pretrained recon models
# (reference ddqn.py:31-62)
def _default_dims(use_latent, use_img, finger):
    if use_latent:
        return 300, (5 if (use_img or finger) else 2)
    return 100, (5 if (use_img or finger) else 2)


class DDQNEngine(PolicyEngine):
    name = "ddqn"

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        c = self.config
        assert c.use_latent or c.use_recon, "DDQN needs latent or mesh obs"
        if c.pretrained_recon:
            c.hidden_dim, c.layers = _default_dims(c.use_latent, c.use_img, c.finger)

        if c.use_latent:
            latent = self.env.auto_model.encoding_size
            self.model = LatentValueNet(
                num_actions=c.num_actions,
                latent_size=latent,
                hidden_dim=c.hidden_dim,
                layers=c.layers,
            )
            dummy = (
                jnp.zeros((1, c.num_actions)),
                jnp.zeros((1, latent)),
                jnp.zeros((1, latent)),
            )
            self._obs_args = lambda b, n=False: (
                jnp.asarray(b["mask_n" if n else "mask"]),
                jnp.asarray(b["latent_n" if n else "latent"]),
                jnp.asarray(b["first_latent"]),
            )
            latent_size, mesh_verts = latent, None
        else:
            self.model = GraphValueNet(
                num_actions=c.num_actions,
                hidden_dim=c.hidden_dim,
                layers=c.layers,
                cut=c.cut,
            )
            nv = self.env.adj_info.num_verts
            dummy = (
                jnp.zeros((1, c.num_actions)),
                jnp.zeros((1, nv, 4)),
                self.env.adj,
            )
            self._obs_args = lambda b, n=False: (
                jnp.asarray(b["mask_n" if n else "mask"]),
                jnp.asarray(b["mesh_n" if n else "mesh"]),
                self.env.adj,
            )
            latent_size, mesh_verts = None, nv

        key = jax.random.PRNGKey(c.seed)
        self.params = self.model.init(key, *dummy)["params"]
        self.target_params = jax.tree_util.tree_map(jnp.copy, self.params)
        self.tx = optax.chain(
            optax.clip(1.0),  # reference clamps grads to ±1 (ddqn.py:120-122)
            optax.adam(c.lr),
        )
        self.opt_state = self.tx.init(self.params)

        self.replay = ReplayMemory(
            capacity=c.mem_capacity,
            num_actions=c.num_actions,
            batch_size=c.train_batch_size,
            burn_in=c.burn_in,
            mesh_verts=mesh_verts,
            latent_size=latent_size,
            seed=c.seed,
        )
        self.random_sampler = RandomSampler(c.num_actions, c.seed)
        self.epsilon = c.epsilon_start
        self.total_steps = 0
        self.episodes = 0

        self._apply = jax.jit(
            lambda p, *a: self.model.apply({"params": p}, *a)
        )
        self._update = jax.jit(self._update_impl)
        self.ckpt = CheckpointManager(c.checkpoint_dir)
        self._restore()

    # ------------------------------------------------------------- persist
    def _restore(self):
        state = {
            "params": self.params,
            "target_params": self.target_params,
            "opt_state": self.opt_state,
        }
        restored = self.ckpt.restore(state, "recent")
        if restored is not None:
            self.params = restored["params"]
            self.target_params = restored["target_params"]
            self.opt_state = restored["opt_state"]
            meta = self.ckpt.meta() or {}
            self.epsilon = meta.get("epsilon", self.epsilon)
            self.total_steps = meta.get("total_steps", 0)
            self.episodes = meta.get("episodes", 0)
            self.replay.load(self.config.checkpoint_dir)

    def save(self):
        self.ckpt.save(
            {
                "params": self.params,
                "target_params": self.target_params,
                "opt_state": self.opt_state,
            },
            "recent",
            meta={
                "epsilon": self.epsilon,
                "total_steps": self.total_steps,
                "episodes": self.episodes,
            },
        )
        self.replay.save(self.config.checkpoint_dir)

    # --------------------------------------------------------------- actor
    def q_values(self, obs, penalize: bool = True) -> np.ndarray:
        v = np.array(self._apply(self.params, *self._obs_args(obs)))
        if penalize:
            v[np.asarray(obs["mask"]) > 0] = -1e10
        return v

    def get_action(self, obs, force_random: bool = False) -> np.ndarray:
        if force_random or np.random.random() < self.epsilon:
            return self.random_sampler.get_action(obs["mask"])
        return np.argmax(self.q_values(obs), axis=1)

    # -------------------------------------------------------------- learner
    def _update_impl(self, params, target_params, opt_state, batch):
        c = self.config
        rewards = batch["rewards"]
        if c.normalization == "first":
            rewards = rewards / batch["first_score"]
        elif c.normalization == "current":
            rewards = rewards / batch["score"]

        cur_args = self._batch_args(batch, next_step=False)
        next_args = self._batch_args(batch, next_step=True)
        not_done = jnp.sum(batch["mask"], axis=1) < c.budget - 1

        def loss_fn(p):
            q_all = self.model.apply({"params": p}, *cur_args)
            q = jnp.take_along_axis(
                q_all, batch["actions"][:, None].astype(jnp.int32), axis=1
            )[:, 0]
            next_online = self.model.apply({"params": p}, *next_args)
            # penalize performed actions when choosing the next argmax; the
            # reference penalizes with the *pre-action* mask here
            # (ddqn.py:26-28 via forward's obs["mask"]) — we use the next
            # mask, which also excludes the just-performed action
            next_online = jnp.where(batch["mask_n"] > 0, -1e10, next_online)
            best_next = jnp.argmax(next_online, axis=1)
            next_target = self.model.apply({"params": target_params}, *next_args)
            q_next = jnp.take_along_axis(next_target, best_next[:, None], axis=1)[:, 0]
            q_next = jnp.where(not_done, q_next, 0.0)
            target = jax.lax.stop_gradient(c.gamma * q_next + rewards)
            return jnp.mean((q - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def _batch_args(self, batch, next_step: bool):
        if self.config.use_latent:
            return (
                batch["mask_n" if next_step else "mask"],
                batch["latent_n" if next_step else "latent"],
                batch["first_latent"],
            )
        return (
            batch["mask_n" if next_step else "mask"],
            batch["mesh_n" if next_step else "mesh"],
            self.env.adj,
        )

    def update_parameters(self):
        batch = self.replay.sample()
        if batch is None:
            return None
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        self.params, self.opt_state, loss = self._update(
            self.params, self.target_params, self.opt_state, batch
        )
        return float(loss)

    # ---------------------------------------------------------------- loop
    def train_epoch(self, max_batches: int | None = None) -> dict:
        c = self.config
        losses, rewards = [], []
        for v, batch in enumerate(self.loader("RL_train")):
            if max_batches is not None and v >= max_batches:
                break
            obs = self.env.reset(batch)
            for _ in range(c.budget):
                burn_in = self.total_steps < c.burn_in
                actions = self.get_action(obs, force_random=burn_in)
                next_obs, reward, done = self.env.step(actions)
                self.replay.push(actions, obs, next_obs, reward)
                loss = self.update_parameters()
                if loss is not None:
                    losses.append(loss)
                rewards.append(float(np.mean(reward)))
                obs = next_obs
                self.total_steps += 1
                if not burn_in:
                    self.epsilon = max(
                        c.epsilon_end, self.epsilon * c.epsilon_decay
                    )
                if self.total_steps % c.target_update == 0:
                    self.target_params = jax.tree_util.tree_map(
                        jnp.copy, self.params
                    )
            self.episodes += 1
        self.save()
        return {
            "loss": float(np.mean(losses)) if losses else float("nan"),
            "reward": float(np.mean(rewards)) if rewards else float("nan"),
            "epsilon": self.epsilon,
        }

    def evaluate(self, split: str = "test", max_batches=None):
        result = run_rollouts(
            self.env,
            self.loader(split),
            lambda obs, step: np.argmax(self.q_values(obs), axis=1),
            self.config.budget,
            max_batches=max_batches,
        )
        self.save_result(result)
        return result
