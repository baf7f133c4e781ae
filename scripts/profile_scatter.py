"""Measure the chamfer-backward scatter wall and candidate replacements.

The clustered CD backward (ops/chamfer_cluster._bwd) emits two (B, N)->(B, M)
scatter-adds per pair.  ROADMAP #1 (round 3): replace XLA's serialized
scatter lowering with a sort + prefix-sum segment reduction (the trick that
already killed the sampling backward wall in ops/sample._interpolate_bwd).

Candidates, all computing dy_j = sum_{i: idx_i = j} val_i  (B, N, 3) -> (B, M, 3):
  A. XLA scatter-add            zeros.at[idx].add(val)         (status quo)
  B. joint sort + prefix-diff   lax.sort((idx, val)) then cumsum/searchsorted
  C. B with idx pre-sorted hint (measures the sort share)
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


def scatter_xla(idx, val, m):
    return jax.vmap(lambda i, v: jnp.zeros((m, 3), val.dtype).at[i].add(v))(idx, val)


def scatter_sorted_segments(idx_sorted, val_sorted, m):
    """Segment sums of a SORTED index stream via prefix-sum differences."""
    prefix = jnp.cumsum(val_sorted, axis=1)
    prefix = jnp.concatenate([jnp.zeros_like(prefix[:, :1]), prefix], axis=1)
    seg_iota = jnp.arange(m + 1, dtype=idx_sorted.dtype)
    bounds = jax.vmap(lambda row: jnp.searchsorted(row, seg_iota, side="left"))(
        idx_sorted
    )  # (B, M+1)
    take = jax.vmap(lambda p, i: p[i])
    return take(prefix, bounds[:, 1:]) - take(prefix, bounds[:, :-1])


def scatter_sortseg(idx, val, m):
    # one joint sort carrying the 3 payload lanes
    idx_s, v0, v1, v2 = jax.lax.sort(
        (idx, val[..., 0], val[..., 1], val[..., 2]), dimension=1, num_keys=1
    )
    val_s = jnp.stack([v0, v1, v2], axis=-1)
    return scatter_sorted_segments(idx_s, val_s, m)


def main():
    b, n, m = 48, 30000, 30000
    rng = np.random.default_rng(0)
    # realistic index stream: NN indices of Morton-sorted queries into a
    # Morton-sorted reference cloud — approximately monotone with noise
    base = np.linspace(0, m - 1, n)
    idx = np.clip(base + rng.normal(0, 300, (b, n)), 0, m - 1).astype(np.int32)
    val = rng.normal(size=(b, n, 3)).astype(np.float32)
    idx_j = jnp.asarray(idx)
    val_j = jnp.asarray(val)
    idx_sorted = jnp.sort(idx_j, axis=1)

    fa = jax.jit(lambda i, v: scatter_xla(i, v, m))
    fb = jax.jit(lambda i, v: scatter_sortseg(i, v, m))
    fc = jax.jit(lambda i, v: scatter_sorted_segments(i, v, m))

    # correctness
    ra = np.asarray(fa(idx_j, val_j))
    rb = np.asarray(fb(idx_j, val_j))
    err = np.abs(ra - rb).max()
    print(f"max |A-B| = {err:.2e}")
    assert err < 1e-3

    ta = timed(fa, idx_j, val_j)
    tb = timed(fb, idx_j, val_j)
    tc = timed(fc, idx_sorted, val_j)
    print(f"A xla scatter-add       : {ta:7.1f} ms")
    print(f"B sort + segment-prefix : {tb:7.1f} ms")
    print(f"C segment-prefix only   : {tc:7.1f} ms  (sort share = {tb - tc:.1f} ms)")


if __name__ == "__main__":
    main()


def extra():
    from active_3d_vision_and_touch_tpu.ops.segsum import scatter_add_3

    b, n, m = 48, 30000, 30000
    rng = np.random.default_rng(0)
    base = np.linspace(0, m - 1, n)
    idx = np.clip(base + rng.normal(0, 300, (b, n)), 0, m - 1).astype(np.int32)
    val = rng.normal(size=(b, n, 3)).astype(np.float32)
    idx_j, val_j = jnp.asarray(idx), jnp.asarray(val)

    fa = jax.jit(lambda i, v: scatter_xla(i, v, m))
    fd = jax.jit(lambda i, v: scatter_add_3(i, v, m))
    ra = np.asarray(fa(idx_j, val_j))
    rd = np.asarray(fd(idx_j, val_j))
    err = np.abs(ra - rd).max()
    print(f"max |A-D| = {err:.2e}")
    assert err < 1e-3, err
    print(f"A xla scatter-add        : {timed(fa, idx_j, val_j):7.1f} ms")
    print(f"D sort + pallas segsum   : {timed(fd, idx_j, val_j):7.1f} ms")

    # adversarial duplicate distribution (all ids equal) — correctness only
    idx_dup = jnp.zeros((2, 1000), jnp.int32)
    val_dup = jnp.ones((2, 1000, 3), jnp.float32)
    out = np.asarray(jax.jit(lambda i, v: scatter_add_3(i, v, 700))(idx_dup, val_dup))
    assert abs(out[0, 0, 0] - 1000.0) < 1e-3 and abs(out.sum() - 6000.0) < 1e-2
    print("duplicate-heavy case OK")
