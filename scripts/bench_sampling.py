"""Microbench: area-weighted sampling fwd/fwd+bwd at training shapes.

Round-3 profile attribution: the ~120 ms sampling block of the train step
is mostly RNG + inverse-CDF, not the interpolate gathers (ROADMAP #10).
This script times batch_sample end-to-end and its pieces so RNG/CDF
changes can be measured in isolation before re-running the full bench.
"""

import argparse
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


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--num", type=int, default=90000)
    ap.add_argument("--verts", type=int, default=2324)
    ap.add_argument("--faces", type=int, default=2688)
    args = ap.parse_args()

    from active_3d_vision_and_touch_tpu.ops import sample as S

    rng = np.random.default_rng(0)
    verts = jnp.asarray(rng.normal(size=(args.batch, args.verts, 3)).astype(np.float32) * 0.1)
    faces = jnp.asarray(rng.integers(0, args.verts, size=(args.faces, 3)).astype(np.int32))
    key = jax.random.PRNGKey(0)

    fwd = jax.jit(lambda v, k: S.batch_sample(v, faces, k, num=args.num))
    ms = timeit(fwd, verts, key)
    print(f"batch_sample fwd: {ms:.1f} ms")

    def loss(v, k):
        return jnp.sum(S.batch_sample(v, faces, k, num=args.num) ** 2)

    g = jax.jit(jax.grad(loss))
    ms = timeit(g, verts, key)
    print(f"batch_sample fwd+bwd: {ms:.1f} ms")

    # pieces
    areas = jax.lax.stop_gradient(S.face_areas(verts, faces))
    probs = areas / jnp.sum(areas, axis=1, keepdims=True)
    cdf = jnp.cumsum(probs, axis=1)

    us = jax.jit(lambda k: S._sorted_uniforms(k, (args.batch, args.num), jnp.float32))
    ms = timeit(us, key)
    print(f"sorted_uniforms: {ms:.1f} ms")
    u_face = us(key)

    icdf = jax.jit(lambda c, u: S._inverse_cdf(c, u))
    ms = timeit(icdf, cdf, u_face)
    print(f"inverse_cdf: {ms:.1f} ms")

    if hasattr(S, "_inverse_cdf_sorted"):
        icdf2 = jax.jit(lambda c, u: S._inverse_cdf_sorted(c, u))
        ms = timeit(icdf2, cdf, u_face)
        print(f"inverse_cdf_sorted: {ms:.1f} ms")
        a = np.asarray(icdf(cdf, u_face))
        b = np.asarray(icdf2(cdf, u_face))
        print(f"agreement: {(a == b).mean():.6f}")

    un = jax.jit(lambda k: jax.random.uniform(k, (args.batch, args.num, 2)))
    ms = timeit(un, key)
    print(f"threefry uniforms (B,num,2): {ms:.1f} ms")
    if hasattr(S, "_rbg_key"):
        rk = S._rbg_key(key)
        un2 = jax.jit(lambda k: jax.random.uniform(k, (args.batch, args.num, 2)))
        ms = timeit(un2, rk)
        print(f"rbg uniforms (B,num,2): {ms:.1f} ms")


if __name__ == "__main__":
    main()
