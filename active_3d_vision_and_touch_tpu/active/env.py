"""The active-touch environment: grasp selection over frozen reconstruction.

RL-style interface over the full stack: each step performs a grasp in the
host simulator, converts the tactile signals into predicted touch charts
(frozen touch model), reconstructs the surface (frozen deformation model),
optionally embeds it (frozen autoencoder), and scores it with the Chamfer
distance against the ground-truth cloud.  Reward = score decrease.

Capability-parity with the reference ``ActiveTouch``
(``policies/environment.py:23-378``) with the TPU restructuring promised in
SURVEY.md §7: one host sim call per step, then a single jit'd device
pipeline over the whole env batch (touch CNN → chart scatter → deformation
→ CD score (→ latent)); the greedy oracle reuses the same batched pipeline
per candidate instead of 50 python-loop evaluations per element.

Vertex mask codes: 0 failed grasp, 1 grasp-without-touch (chart collapsed
to sensor origin), 2 successful touch, 3 vision chart.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from active_3d_vision_and_touch_tpu.core import touch_chart
from active_3d_vision_and_touch_tpu.core.config import PolicyConfig, SimConfig
from active_3d_vision_and_touch_tpu.models import TouchChartEncoder, prepare_charts
from active_3d_vision_and_touch_tpu.models.autoencoder import MeshAutoEncoder
from active_3d_vision_and_touch_tpu.ops import mesh_chamfer_distance
from active_3d_vision_and_touch_tpu.sim.sampler import Sampler
from active_3d_vision_and_touch_tpu.train.vision import build_deformation


class ActiveTouchEnv:
    def __init__(
        self,
        config: PolicyConfig,
        touch_state: dict,
        vision_state: dict,
        auto_state: dict | None = None,
        auto_model: MeshAutoEncoder | None = None,
        sampler: Sampler | None = None,
        chart_cache_root: str | None = None,
    ):
        self.config = config
        self.key = jax.random.PRNGKey(config.seed)
        self.steps = 0

        self.touch_model = TouchChartEncoder()
        self.touch_state = touch_state
        self.deform, self.adj_info, self.initial_mesh = build_deformation(config)
        self.vision_state = vision_state
        self.adj = jnp.asarray(self.adj_info.adj)
        self.original_adj = jnp.asarray(self.adj_info.original)
        self.faces = jnp.asarray(self.adj_info.faces)
        self.chart_verts = jnp.asarray(touch_chart().verts)

        self.use_latent = config.use_latent
        self.auto_model = auto_model
        self.auto_state = auto_state
        if self.use_latent:
            assert auto_model is not None and auto_state is not None

        self.sampler = sampler or Sampler(
            bs=config.env_batch_size, vision=False, config=SimConfig()
        )

        self._greedy_rng = np.random.default_rng(config.seed + 12345)
        self.num_fingers = config.num_fingers
        b, f, g = config.env_batch_size, self.num_fingers, config.num_grasps
        self._chart_shape = (b, f, g, 25, 3)
        self._mask_shape = (b, f, g, 25, 1)
        self.current: dict = {}

        # (object name, action) → (charts (nf,25,3), mask codes (nf,)).
        # The host simulator is deterministic per (object, action), so
        # oracle sweeps (greedy/MFBA/LEBA probe the same pairs across steps
        # and epochs) are pure cache hits — the reference pays the full
        # 50x per-step sim cost every time (environment.py:167-213).
        self._sig_cache: dict = {}
        self._sig_cache_cap = 200_000

        # Optional dataset-backed signal source: the charts stage
        # (data.generation.make_touch_charts) already ran the SAME frozen
        # touch model over the SAME deterministic grasps for every
        # (object, action) slot and cached (num_actions, 4, 25, 4) per
        # object — gathering from that cache is signal-identical to live
        # simulation, so policy sweeps pay zero host-sim / touch-CNN cost.
        # Objects or actions outside the cache fall back to live sim.
        self._chart_cache_root = chart_cache_root
        self._chart_cache: dict = {}

        self._predict_touch = jax.jit(self._predict_touch_impl)
        self._reconstruct = jax.jit(self._reconstruct_impl)
        self._score_chunk = jax.jit(self._score_chunk_impl)

    # ------------------------------------------------------------------ jit
    def _predict_touch_impl(self, touch, pos, rot):
        variables = {
            "params": self.touch_state["params"],
            "batch_stats": self.touch_state["batch_stats"],
        }
        return self.touch_model.apply(
            variables, touch, pos, rot, self.chart_verts
        )

    def _reconstruct_impl(self, img, touch_charts, touch_masks, gt_points, key):
        b = gt_points.shape[0]
        stacked = jnp.concatenate(
            [
                touch_charts.reshape(b, -1, 3),
                touch_masks.reshape(b, -1, 1),
            ],
            axis=-1,
        )
        charts = prepare_charts(stacked, self.initial_mesh, b, use_touch=True)
        variables = {"params": self.vision_state["params"]}
        if self.vision_state.get("batch_stats"):
            variables["batch_stats"] = self.vision_state["batch_stats"]
        verts, mask = self.deform.apply(
            variables,
            img if self.config.use_img else None,
            charts,
            self.adj,
            self.original_adj,
        )
        score = self.config.loss_coeff * mesh_chamfer_distance(
            verts, self.faces, gt_points, key, num=self.config.number_points
        )
        latent = None
        if self.use_latent:
            latent = self.auto_model.apply(
                {"params": self.auto_state["params"]},
                verts,
                mask,
                self.adj,
                only_encode=True,
            )
        return verts, mask, score, latent

    def _score_chunk_impl(
        self, img, base_charts, base_masks, cand_charts, cand_masks, step,
        gt_points, key,
    ):
        """Score ``kc`` candidate actions per element in ONE device launch:
        fold the candidate axis onto the batch axis (SURVEY.md §7 step 6 —
        the structural fix for the reference's per-candidate python loop,
        ``policies/environment.py:167-213``).

        base: (b, nf, g, 25, ·) committed charts; cand: (b, kc, nf, 25, ·)
        per-candidate charts for grasp slot ``step`` (traced scalar — the
        slot select is a mask, so one compilation serves all steps).
        Returns (b, kc) CD scores.
        """
        b, kc = cand_charts.shape[:2]
        g = base_charts.shape[2]
        sel = (jnp.arange(g) == step)[None, None, None, :, None, None]
        charts = jnp.where(
            sel, cand_charts[:, :, :, None], base_charts[:, None]
        )  # (b, kc, nf, g, 25, 3)
        masks = jnp.where(sel, cand_masks[:, :, :, None], base_masks[:, None])
        bk = b * kc
        stacked = jnp.concatenate(
            [charts.reshape(bk, -1, 3), masks.reshape(bk, -1, 1)], axis=-1
        )
        prepared = prepare_charts(stacked, self.initial_mesh, bk, use_touch=True)
        variables = {"params": self.vision_state["params"]}
        if self.vision_state.get("batch_stats"):
            variables["batch_stats"] = self.vision_state["batch_stats"]
        img_k = (
            jnp.repeat(img, kc, axis=0) if self.config.use_img else None
        )
        verts, _ = self.deform.apply(
            variables, img_k, prepared, self.adj, self.original_adj
        )
        score = self.config.loss_coeff * mesh_chamfer_distance(
            verts,
            self.faces,
            jnp.repeat(gt_points, kc, axis=0),
            key,
            num=self.config.number_points,
        )
        return score.reshape(b, kc)

    # ------------------------------------------------------------- episode
    def reset(self, batch: dict) -> dict:
        """Start an episode on a new batch of objects (dict with ``names``
        path prefixes, ``gt_points`` and optionally ``img``)."""
        c = self.config
        self.steps = 0
        self.current = {
            "batch": batch,
            "mask": np.zeros((c.env_batch_size, c.num_actions), np.float32),
            "first_score": None,
            "touch_charts": np.zeros(self._chart_shape, np.float32),
            "touch_masks": np.zeros(self._mask_shape, np.float32),
        }
        self.sampler.load_objects(batch["names"], from_dataset=True)
        if self._chart_cache_root is not None:
            self._prime_signal_cache(batch["names"])
        obs = self.compute_obs()
        self.current["score"] = obs["score"]
        return obs

    def step(self, actions):
        actions = np.asarray(actions).reshape(-1)
        for i, a in enumerate(actions):
            self.current["mask"][i, int(a)] = 1
        obs = self.compute_obs(actions)
        reward = self.current["score"] - obs["score"]
        self.current["score"] = obs["score"]
        self.steps += 1
        done = self.steps == self.config.budget
        return obs, reward, done

    def check_step(self, actions) -> dict:
        """Score a candidate action without committing state."""
        return self.compute_obs(np.asarray(actions))

    def score_candidates(
        self, candidates: np.ndarray, chunk: int = 10
    ) -> np.ndarray:
        """(b, K) candidate actions → (b, K) scores, without committing
        state: the score element i would see if it took candidates[i, j] as
        its next grasp.  Candidates fold onto the batch axis of one jit'd
        scoring launch per ``chunk`` columns (vs the reference's 50
        sequential per-candidate evaluations, ``environment.py:167-213``);
        host simulation of chunk j+1 overlaps the device scoring of chunk j
        (async dispatch), and repeated (object, action) pairs ride the
        signal cache.
        """
        c = self.config
        b, k = candidates.shape
        nf = self.num_fingers
        names = self.current["batch"]["names"]
        base_charts = jnp.asarray(self.current["touch_charts"][:, :nf])
        base_masks = jnp.asarray(self.current["touch_masks"][:, :nf])
        img = (
            jnp.asarray(self.current["batch"]["img"])
            if c.use_img
            else jnp.zeros((1,))
        )
        gt = jnp.asarray(self.current["batch"]["gt_points"])

        kc = min(chunk, k)
        futures = []
        for start in range(0, k, kc):
            cols = candidates[:, start : start + kc]
            if cols.shape[1] < kc:  # pad so the jit compiles once
                cols = np.concatenate(
                    [cols, np.repeat(cols[:, :1], kc - cols.shape[1], 1)], 1
                )
            cand_charts = np.zeros((b, kc, nf, 25, 3), np.float32)
            cand_masks = np.zeros((b, kc, nf, 25, 1), np.float32)
            for j in range(kc):
                keys = [(str(names[i]), int(cols[i, j])) for i in range(b)]
                if any(kk not in self._sig_cache for kk in keys):
                    self._simulate_and_cache(cols[:, j], keys)
                for i in range(b):
                    charts_i, codes_i, pos_i = self._sig_cache[keys[i]]
                    for jf in range(nf):
                        code = codes_i[jf]
                        if code == 2:
                            cand_charts[i, j, jf] = charts_i[jf]
                        elif code == 1:
                            cand_charts[i, j, jf] = pos_i[jf]
                        cand_masks[i, j, jf] = code
            self.key, sub = jax.random.split(self.key)
            futures.append(
                self._score_chunk(
                    img, base_charts, base_masks,
                    jnp.asarray(cand_charts), jnp.asarray(cand_masks),
                    self.steps, gt, sub,
                )
            )
        scores = np.concatenate([np.asarray(f) for f in futures], axis=1)
        return scores[:, :k]

    def best_action(self, greedy_checks: int | None = None) -> np.ndarray:
        """Myopic-oracle action selection WITHOUT committing a step: score
        candidates in batched device launches and return the best unseen
        action per element.  MFBA's tally only needs the argmin (the
        reference calls ``best_step`` and discards the committed
        observation, ``MFBA.py:95-99`` — one full reconstruction+CD pass
        per batch wasted)."""
        c = self.config
        b = c.env_batch_size
        if greedy_checks is None or greedy_checks >= c.num_actions:
            candidates = np.tile(np.arange(c.num_actions), (b, 1))
        else:
            candidates = np.zeros((b, greedy_checks), int)
            for i in range(b):
                unseen = np.nonzero(self.current["mask"][i] == 0)[0]
                k = min(greedy_checks, len(unseen))
                row = (
                    self._greedy_rng.choice(unseen, size=k, replace=False)
                    if k
                    else np.empty(0, int)
                )
                if k < greedy_checks:
                    # fewer unseen actions than probe slots (long budgets /
                    # small action spaces): pad with already-tried actions —
                    # they can never win because the selection below
                    # requires mask == 0
                    seen = np.nonzero(self.current["mask"][i] != 0)[0]
                    pool = seen if len(seen) else np.arange(c.num_actions)
                    pad = self._greedy_rng.choice(
                        pool, size=greedy_checks - k, replace=True
                    )
                    row = np.concatenate([row, pad])
                candidates[i] = row

        scores = self.score_candidates(candidates)
        seen = self.current["mask"][
            np.arange(b)[:, None], candidates
        ] != 0
        scores = np.where(seen, np.inf, scores)
        best_action = candidates[np.arange(b), np.argmin(scores, axis=1)]
        all_seen = np.isinf(scores).all(axis=1)
        return np.where(all_seen, 0, best_action)  # legacy fallback

    def best_step(self, greedy_checks: int | None = None):
        """Myopic oracle: ``best_action`` then commit it (reference
        ``environment.py:167-213``)."""
        best = self.best_action(greedy_checks)
        obs, reward, done = self.step(best)
        return best, obs, reward, done

    def reset_sampler(self) -> None:
        """Tear down and rebuild the host simulator scenes (API parity with
        the reference's pybullet memory-leak workaround,
        ``environment.py:367-373``; our scenes don't leak, but long runs can
        still recycle the thread pool)."""
        self.sampler.disconnect()
        self.sampler = Sampler(
            bs=self.config.env_batch_size, vision=False, config=SimConfig()
        )

    # --------------------------------------------------------------- obs
    def _apply_signals(self, actions) -> None:
        """Write the charts for ``actions`` into the current step's slot
        (idempotent for repeated candidate evaluation).  Runs the host sim
        + touch CNN only when some (object, action) pair is not already in
        the signal cache."""
        c = self.config
        b = c.env_batch_size
        actions = np.asarray(actions).reshape(-1)
        names = self.current["batch"]["names"]
        keys = [(str(names[i]), int(actions[i])) for i in range(b)]

        if any(k not in self._sig_cache for k in keys):
            self._simulate_and_cache(actions, keys)

        step = self.steps
        for i in range(b):
            charts_i, codes_i, pos_i = self._sig_cache[keys[i]]
            for jf in range(charts_i.shape[0]):
                code = codes_i[jf]
                if code == 2:
                    self.current["touch_charts"][i, jf, step] = charts_i[jf]
                elif code == 1:
                    self.current["touch_charts"][i, jf, step] = pos_i[jf]
                else:
                    self.current["touch_charts"][i, jf, step] = 0
                self.current["touch_masks"][i, jf, step] = code

    def _prime_signal_cache(self, names) -> None:
        """Fill ``_sig_cache`` for every action of the episode's objects from
        the dataset's precomputed chart cache
        (``<root>/touch_charts/<obj>/touch_charts.npy``, written by
        ``make_touch_charts`` with the same frozen touch model over the same
        deterministic grasps).  The reference re-simulates + re-encodes every
        probe live (``environment.py:167-213``); here dataset objects become
        pure host-RAM gathers.  Missing files/actions fall back to live sim."""
        import os

        fingers = [1] if self.config.finger else list(range(4))
        for prefix in names:
            p = str(prefix)
            obj = os.path.basename(p)
            if obj not in self._chart_cache:
                f = os.path.join(
                    self._chart_cache_root, "touch_charts", obj,
                    "touch_charts.npy",
                )
                arr = np.load(f).astype(np.float32) if os.path.exists(f) else None
                if arr is not None:
                    arr.setflags(write=False)
                self._chart_cache[obj] = arr
            arr = self._chart_cache[obj]
            if arr is None:
                continue
            if len(self._sig_cache) > self._sig_cache_cap:
                self._sig_cache.clear()
            for a in range(min(arr.shape[0], self.config.num_actions)):
                key = (p, a)
                if key in self._sig_cache:
                    continue
                slot = arr[a][fingers]  # (nf, 25, 4): xyz | mask code
                # code-1 slots are stored collapsed to the sensor position,
                # so row 0's xyz doubles as the finger position
                self._sig_cache[key] = (
                    slot[:, :, :3],
                    slot[:, 0, 3].astype(np.int8),
                    slot[:, 0, :3],
                )

    def _simulate_and_cache(self, actions, keys) -> None:
        c = self.config
        b = c.env_batch_size
        signals = self.sampler.sample(actions, touch=True)

        if c.finger:
            fingers = [1]
        else:
            fingers = list(range(4))
        nf = len(fingers)

        touch = signals["touch_signal"][:, fingers].reshape(b * nf, 121, 121, 3)
        pos = signals["finger_transform_pos"][:, fingers].reshape(b * nf, 3)
        rot = signals["finger_transform_rot_M"][:, fingers].reshape(b * nf, 3, 3)
        charts = np.asarray(
            self._predict_touch(jnp.asarray(touch / 255.0), jnp.asarray(pos), jnp.asarray(rot))
        ).reshape(b, nf, 25, 3)
        pos = pos.reshape(b, nf, 3)

        code_of = {"touch": 2, "no_touch": 1, "no_intersection": 0}
        if len(self._sig_cache) > self._sig_cache_cap:
            self._sig_cache.clear()
        for i, key in enumerate(keys):
            codes = np.array(
                [code_of[signals["touch_status"][i][f]] for f in fingers], np.int8
            )
            self._sig_cache[key] = (charts[i].copy(), codes, pos[i].copy())

    def _dispatch_obs(self):
        """Launch the device pipeline for the CURRENT chart state and return
        the in-flight device values (jax dispatch is async — the host is
        free until something converts them to numpy)."""
        c = self.config
        batch = self.current["batch"]
        img = jnp.asarray(batch["img"]) if c.use_img else jnp.zeros((1,))
        self.key, sub = jax.random.split(self.key)
        return self._reconstruct(
            img,
            jnp.asarray(self.current["touch_charts"][:, : self.num_fingers]),
            jnp.asarray(self.current["touch_masks"][:, : self.num_fingers]),
            jnp.asarray(batch["gt_points"]),
            sub,
        )

    def compute_obs(self, actions=None) -> dict:
        if actions is not None:
            self._apply_signals(np.asarray(actions))
        return self._finalize_obs(self._dispatch_obs())

    def _finalize_obs(self, outputs) -> dict:
        batch = self.current["batch"]
        verts, mask, score, latent = outputs
        score = np.asarray(score)
        if self.current["first_score"] is None:
            self.current["first_score"] = score.copy()
            if self.use_latent:
                self.current["first_latent"] = np.asarray(latent)

        obs = {
            "score": score.copy(),
            "first_score": self.current["first_score"].copy(),
            "mask": self.current["mask"].copy(),
            "names": batch["names"],
            "mesh": np.concatenate(
                [np.asarray(verts), np.asarray(mask)], axis=-1
            ),
        }
        if self.use_latent:
            obs["latent"] = np.asarray(latent)
            obs["first_latent"] = self.current["first_latent"].copy()
        return obs
