"""Shared experiment-engine facilities: checkpoints, early stop, metrics.

Covers the reference's per-engine ops plumbing (best/recent dual
checkpoints, patience early stop, TensorBoard scalars, config JSON;
``reconstruction/vision/train.py:210-284``) with orbax-backed pytree
checkpointing and a pluggable metrics writer.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import jax
import numpy as np
import orbax.checkpoint as ocp


class EarlyStop:
    """Patience-based early stopping on a minimized validation metric."""

    def __init__(self, patience: int):
        self.patience = patience
        self.best = float("inf")
        self.since_improvement = 0

    def update(self, value: float) -> bool:
        """Returns True if ``value`` improved the best (→ checkpoint now)."""
        if value <= self.best:
            self.best = float(value)
            self.since_improvement = 0
            return True
        self.since_improvement += 1
        return False

    @property
    def should_stop(self) -> bool:
        return self.since_improvement >= self.patience

    def state(self) -> dict:
        return {"best": self.best, "since_improvement": self.since_improvement}

    def restore(self, state: dict) -> None:
        self.best = state["best"]
        self.since_improvement = state["since_improvement"]


class CheckpointManager:
    """Best + recent pytree checkpoints with a small JSON sidecar.

    Layout: ``<dir>/best/`` and ``<dir>/recent/`` orbax pytrees plus
    ``<dir>/state.json`` carrying epoch / early-stop counters.
    """

    def __init__(self, directory: str, async_save: bool = False):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()
        # async mode: serialization runs on a background thread so the
        # train loop never blocks on checkpoint IO (matters on multi-host
        # runs where every host writes its process shard); saves are
        # fenced in wait_until_finished() / restore / close
        self._async = (
            ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
            if async_save
            else None
        )

    def _slot(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, state, name: str = "recent", meta: dict | None = None) -> None:
        state = jax.device_get(state)
        if self._async is not None:
            self._async.save(self._slot(name), state, force=True)
        else:
            self._ckpt.save(self._slot(name), state, force=True)
        if meta is not None:
            tmp = os.path.join(self.directory, "state.json.tmp")
            with open(tmp, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, os.path.join(self.directory, "state.json"))

    def wait_until_finished(self) -> None:
        """Block until any in-flight async save has committed."""
        if self._async is not None:
            self._async.wait_until_finished()

    def restore(self, template, name: str = "recent"):
        self.wait_until_finished()
        path = self._slot(name)
        if not os.path.exists(path):
            return None
        return self._ckpt.restore(path, item=jax.device_get(template))

    def restore_raw(self, name: str = "recent"):
        """Restore the saved pytree as-is (no template) — for consumers that
        only need a sub-tree (e.g. frozen params out of a full train state)."""
        path = self._slot(name)
        if not os.path.exists(path):
            return None
        return self._ckpt.restore(path)

    def meta(self) -> dict | None:
        path = os.path.join(self.directory, "state.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def exists(self, name: str = "recent") -> bool:
        return os.path.exists(self._slot(name))


class MetricsWriter:
    """JSONL scalar stream grouped by experiment id, with an optional
    TensorBoard mirror.

    JSONL is the primary sink (plain files, no deps).  TensorBoard event
    files are OPT-IN via ``A3VT_TENSORBOARD=1`` — the writer lives in
    torch, a heavyweight incidental import for a JAX framework.
    """

    def __init__(self, log_dir: str, exp_id: str):
        self.exp_id = exp_id
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, f"{exp_id}.metrics.jsonl"), "a")
        self._tb = None
        if os.environ.get("A3VT_TENSORBOARD"):
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:  # pragma: no cover - tensorboard optional
                self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        value = float(np.asarray(value))
        self._jsonl.write(
            json.dumps({"tag": tag, "exp_id": self.exp_id, "value": value, "step": step})
            + "\n"
        )
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalars(tag, {self.exp_id: value}, step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


@dataclass
class TrainState:
    """Minimal mutable train state bundle (params + aux collections +
    optimizer state).  Kept as a plain pytree so orbax/jit handle it."""

    params: dict
    batch_stats: dict
    opt_state: tuple
    step: int = 0

    def tree(self):
        return {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
            "step": self.step,
        }
