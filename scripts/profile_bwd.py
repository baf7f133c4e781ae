"""Where does the clustered-CD training backward actually spend time?

Measures at the training shape (3-repeat fold: B=48, 30k x 30k):
  1. fwd only
  2. grad wrt x only (gt side should be DCE'd)
  3. grad wrt both x and y
  4. the isolated unsort permutation scatter vs inverse-perm gather
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

from active_3d_vision_and_touch_tpu.ops.chamfer_cluster import (
    chamfer_distance_clustered,
)


def timed(fn, *args, iters=10, warmup=2):
    def digest(out):
        leaves = jax.tree_util.tree_leaves(out)
        return float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves))

    for _ in range(warmup):
        digest(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        digest(fn(*args))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    b, n = 48, 30000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32)) * 0.5
    y = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32)) * 0.5

    fwd = jax.jit(lambda a, c: jnp.sum(chamfer_distance_clustered(a, c)))
    gx = jax.jit(jax.grad(lambda a, c: jnp.sum(chamfer_distance_clustered(a, c)), 0))
    gxy = jax.jit(
        jax.grad(lambda a, c: jnp.sum(chamfer_distance_clustered(a, c)), (0, 1))
    )

    print(f"fwd            : {timed(fwd, x, y):7.1f} ms")
    print(f"grad x only    : {timed(gx, x, y):7.1f} ms")
    print(f"grad x and y   : {timed(gxy, x, y):7.1f} ms")

    # isolated unsort cost: permutation scatter vs inverse-perm gather
    perm = jnp.asarray(
        np.stack([rng.permutation(n) for _ in range(b)]).astype(np.int32)
    )
    vals = x
    unsort_scatter = jax.jit(
        jax.vmap(lambda p, v: jnp.zeros_like(v).at[p].set(v))
    )
    def unsort_gather_fn(p, v):
        inv = jnp.zeros((n,), jnp.int32).at[p].set(jnp.arange(n, dtype=jnp.int32))
        return v[inv]
    unsort_gather = jax.jit(jax.vmap(unsort_gather_fn))
    ra = np.asarray(unsort_scatter(perm, vals))
    rb = np.asarray(unsort_gather(perm, vals))
    assert np.abs(ra - rb).max() == 0
    print(f"unsort scatter : {timed(unsort_scatter, perm, vals):7.1f} ms")
    print(f"unsort gather  : {timed(unsort_gather, perm, vals):7.1f} ms")


if __name__ == "__main__":
    main()
