"""Accuracy/speed sweep over chunks_per_tile (T) at the training scale.

Agreement = fraction of queries whose found neighbor DISTANCE matches the
true minimum (the gradient only depends on the neighbor's position, so
distance-match is the right metric).  Uses real procedural-object surface
clouds at 30k points — the actual training distribution.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from active_3d_vision_and_touch_tpu.data import random_object
from active_3d_vision_and_touch_tpu.ops import batch_sample
from active_3d_vision_and_touch_tpu.ops.chamfer import chamfer_distance
from active_3d_vision_and_touch_tpu.ops.chamfer_cluster import (
    chamfer_distance_clustered,
    min_dists_clustered,
)
from active_3d_vision_and_touch_tpu.ops.chamfer import _min_dists_pallas


def timed(fn, *args, iters=8):
    def digest(out):
        leaves = jax.tree_util.tree_leaves(out)
        return float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves))

    digest(fn(*args))
    digest(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        digest(fn(*args))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    B, N = 8, 30000
    verts, faces_list, clouds = [], [], []
    for i in range(B):
        obj = random_object(100 + i)
        v = jnp.asarray(obj.verts)[None]
        f = jnp.asarray(obj.faces)
        clouds.append(batch_sample(v, f, jax.random.PRNGKey(i), num=N)[0])
    x = jnp.stack(clouds)
    y = jnp.stack(
        [
            batch_sample(
                jnp.asarray(random_object(100 + i).verts)[None] * 1.02,
                jnp.asarray(random_object(100 + i).faces),
                jax.random.PRNGKey(50 + i),
                num=N,
            )[0]
            for i in range(B)
        ]
    )

    d_true, _ = jax.jit(_min_dists_pallas)(x, y)
    d_true = np.asarray(d_true)

    for T in (24, 16, 12, 8):
        d_cl, _ = jax.jit(
            lambda a, b, t=T: min_dists_clustered(a, b, 128, t)
        )(x, y)
        agree = float(
            np.isclose(np.asarray(d_cl), d_true, rtol=1e-5, atol=1e-10).mean()
        )
        t_fwd = timed(
            jax.jit(lambda a, b, t=T: chamfer_distance_clustered(a, b, 128, t)), x, y
        )
        t_grad = timed(
            jax.jit(jax.grad(
                lambda a, b, t=T: chamfer_distance_clustered(a, b, 128, t).sum()
            )), x, y,
        )
        print(
            f"T={T:2d}: neighbor-dist agreement {agree * 100:.3f}%  "
            f"fwd {t_fwd:6.1f} ms  grad {t_grad:6.1f} ms (B=8)",
            flush=True,
        )


if __name__ == "__main__":
    main()
