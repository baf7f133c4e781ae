"""Experiment: can the clustered-CD training loss skip the x-side Morton
sort when queries are atlas-face-ordered mesh samples?

Builds the real deformation atlas mesh, perturbs vertices (stand-in for
model predictions), samples points with batch_sample (face-CDF order), and
compares the sort_x=False clustered CD against sort_x=True and the exact
CD: value gap + timing at bench shapes (B=48 folded, 30k points).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from active_3d_vision_and_touch_tpu.core.config import VisionConfig
from active_3d_vision_and_touch_tpu.ops import chamfer
from active_3d_vision_and_touch_tpu.ops.chamfer_cluster import _pair_min_dists_sorted
from active_3d_vision_and_touch_tpu.ops.sample import batch_sample
from active_3d_vision_and_touch_tpu.train.vision import build_deformation


def timed(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.tree_util.tree_map(lambda l: np.asarray(l).sum(), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.tree_util.tree_map(lambda l: np.asarray(l).sum(), out)
    return (time.perf_counter() - t0) / iters * 1000, out


def main():
    B, R, N = 16, 3, 30000
    _, adj_info, initial_mesh = build_deformation(
        VisionConfig(use_img=False, use_touch=True, eval=True)
    )
    verts0 = jnp.asarray(initial_mesh)[None]
    faces = jnp.asarray(adj_info.faces)
    rng = np.random.default_rng(0)
    # perturbed atlas meshes — stand-in for mid-training predictions
    verts = verts0 + 0.15 * jnp.asarray(
        rng.normal(size=(B, verts0.shape[1], 3)), jnp.float32
    ) * jnp.abs(verts0).mean()
    x = batch_sample(verts, faces, jax.random.PRNGKey(0), num=N * R)
    x = jnp.concatenate(jnp.split(x, R, axis=1))  # (R*B, N, 3) face-ordered
    gt = batch_sample(verts * 1.01, faces, jax.random.PRNGKey(1), num=N)
    gt_t = jnp.tile(gt, (R, 1, 1))

    def cd_sorted(a, b):
        _, dx, dy = _pair_min_dists_sorted(a, b, 128, 24, sort_x=True)
        return jnp.mean(dx, axis=1) + jnp.mean(dy, axis=1)

    def cd_faceorder(a, b):
        _, dx, dy = _pair_min_dists_sorted(a, b, 128, 24, sort_x=False)
        return jnp.mean(dx, axis=1) + jnp.mean(dy, axis=1)

    cd_exact = np.asarray(chamfer.chamfer_distance(x, gt_t))
    t_s, cd_s = timed(jax.jit(cd_sorted), x, gt_t)
    t_f, cd_f = timed(jax.jit(cd_faceorder), x, gt_t)
    cd_s, cd_f = np.asarray(cd_s), np.asarray(cd_f)
    print(f"sorted   : {t_s:6.1f} ms  rel gap vs exact {np.abs(cd_s-cd_exact).max()/cd_exact.mean():.2e}")
    print(f"faceorder: {t_f:6.1f} ms  rel gap vs exact {np.abs(cd_f-cd_exact).max()/cd_exact.mean():.2e}")

    tg_s, _ = timed(jax.jit(jax.grad(lambda a, b: cd_sorted(a, b).sum())), x, gt_t)
    tg_f, _ = timed(jax.jit(jax.grad(lambda a, b: cd_faceorder(a, b).sum())), x, gt_t)
    print(f"grad sorted {tg_s:6.1f} ms | grad faceorder {tg_f:6.1f} ms")


if __name__ == "__main__":
    main()
