"""Breakdown profile of the clustered Chamfer prep vs kernel on real TPU.

Times each stage of ops/chamfer_cluster.py separately (Morton sort, tile
selection, packing, Pallas kernel, index unscramble) to rank the round-2
optimization targets, plus the exact kernel and end-to-end comparisons.
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

# the axon sitecustomize imports jax first; env vars alone don't stick
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)

from active_3d_vision_and_touch_tpu.ops import chamfer, chamfer_cluster as cc


def timed(fn, *args, iters=10, warmup=2):
    """Times fn; fetches a scalar digest of the outputs every iteration —
    block_until_ready through the axon tunnel does not reliably block, so a
    device_get round trip is the only trustworthy fence."""

    def digest(out):
        leaves = jax.tree_util.tree_leaves(out)
        return float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves))

    for _ in range(warmup):
        out = fn(*args)
        digest(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        digest(out)
    return (time.perf_counter() - t0) / iters * 1000, out


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--section", default="all", choices=["all", "breakdown", "variants", "mesh"]
    )
    args = ap.parse_args()
    B, N, M = 16, 30000, 30000
    rng = np.random.default_rng(0)
    # surface-like cloud: sphere + noise (matches the training distribution
    # better than a uniform ball)
    def cloud(n):
        v = rng.normal(size=(B, n, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        return jnp.asarray(v + 0.02 * rng.normal(size=v.shape), jnp.float32)

    x, y = cloud(N), cloud(M)

    S, T = 128, 24

    if args.section == "variants":
        for S_, T_ in ((128, 24), (128, 16), (256, 12), (256, 8)):
            t, _ = timed(
                jax.jit(lambda a, b, s=S_, tt=T_: cc.chamfer_distance_clustered(a, b, s, tt)),
                x, y,
            )
            tg, _ = timed(
                jax.jit(jax.grad(
                    lambda a, b, s=S_, tt=T_: cc.chamfer_distance_clustered(a, b, s, tt).sum()
                )),
                x, y,
            )
            print(f"clustered S={S_:3d} T={T_:2d}:  fwd {t:6.1f} ms  grad {tg:6.1f} ms", flush=True)
        return

    if args.section == "mesh":
        from active_3d_vision_and_touch_tpu.ops.chamfer import mesh_chamfer_distance

        V = 2324
        verts = jnp.asarray(rng.normal(size=(16, V, 3)), jnp.float32) * 0.3
        faces = jnp.asarray(rng.integers(0, V, size=(4608, 3)).astype(np.int32))
        key = jax.random.PRNGKey(0)
        for nn in ("exact", "clustered"):
            t, _ = timed(
                jax.jit(lambda v, g, k, nn=nn: mesh_chamfer_distance(
                    v, faces, g, k, num=N, nn=nn)),
                verts, y, key,
            )
            tg, _ = timed(
                jax.jit(jax.grad(lambda v, g, k, nn=nn: mesh_chamfer_distance(
                    v, faces, g, k, num=N, nn=nn).sum())),
                verts, y, key,
            )
            print(f"mesh 3-repeat {nn:9s}: fwd {t:6.1f} ms  grad {tg:6.1f} ms", flush=True)
        return

    t, _ = timed(jax.jit(lambda a, b: chamfer.chamfer_distance(a, b)), x, y)
    print(f"exact fwd:           {t:7.1f} ms")
    t, _ = timed(
        jax.jit(jax.grad(lambda a, b: chamfer.chamfer_distance(a, b).sum())), x, y
    )
    print(f"exact grad:          {t:7.1f} ms")

    t, _ = timed(
        jax.jit(lambda a, b: cc.chamfer_distance_clustered(a, b, S, T)), x, y
    )
    print(f"clustered fwd:       {t:7.1f} ms")
    t, _ = timed(
        jax.jit(jax.grad(lambda a, b: cc.chamfer_distance_clustered(a, b, S, T).sum())),
        x, y,
    )
    print(f"clustered grad:      {t:7.1f} ms")

    # ---- stage breakdown (one direction, x→y) ----
    t, (xs, xperm) = timed(jax.jit(cc._sort_by_morton), x)
    print(f"morton sort (1 cloud): {t:5.1f} ms")
    _, (ys, yperm) = timed(jax.jit(cc._sort_by_morton), y)
    xs_p = jax.jit(lambda a: cc._edge_pad_points(a, cc._TN))(xs)
    ys_p = jax.jit(lambda a: cc._edge_pad_points(a, S))(ys)

    t, (d_sorted, i_sorted) = timed(
        jax.jit(lambda a, b: cc._nn_clustered_sorted(a, b, S, T, False)), xs_p, ys_p
    )
    print(f"selection+pack+kernel: {t:5.1f} ms  (sorted in, one direction)")

    # selection alone (returns chunk ids, stops before the pallas_call)
    def select_only(xs_, ys_):
        b = xs_.shape[0]
        c = ys_.shape[1] // S
        n_tiles = xs_.shape[1] // cc._TN
        y_chunks = ys_.reshape(b, c, S, 3)
        chunk_c = jnp.mean(y_chunks, axis=2)
        chunk_r = jnp.sqrt(
            jnp.max(jnp.sum((y_chunks - chunk_c[:, :, None, :]) ** 2, axis=-1), axis=2)
        )
        x_tiles = jnp.moveaxis(xs_.reshape(b, n_tiles, cc._TN, 3), 1, 0)
        k_vote = min(3, c)

        def tile_select(x_tile):
            q_bound = (
                jnp.sqrt(
                    jnp.sum((x_tile[:, :, None, :] - chunk_c[:, None, :, :]) ** 2, -1)
                )
                - chunk_r[:, None, :]
            )
            _, q_top = jax.lax.top_k(-q_bound, k_vote)
            votes = jnp.zeros((b, c), jnp.float32)
            votes = jax.vmap(lambda v, idx: v.at[idx.reshape(-1)].add(1.0))(votes, q_top)
            tile_c = jnp.mean(x_tile, axis=1)
            tile_bound = (
                jnp.sqrt(jnp.sum((tile_c[:, None, :] - chunk_c) ** 2, -1)) - chunk_r
            )
            score = votes + 1.0 / (1.0 + jnp.maximum(tile_bound, 0.0))
            _, ids = jax.lax.top_k(score, min(T, c))
            return ids.astype(jnp.int32)

        return jnp.moveaxis(jax.lax.map(tile_select, x_tiles), 0, 1)

    t, chunk_ids = timed(jax.jit(select_only), xs_p, ys_p)
    print(f"tile selection alone:  {t:5.1f} ms")

    def pack_only(ys_):
        b = ys_.shape[0]
        c = ys_.shape[1] // S
        y_chunks = ys_.reshape(b, c, S, 3)
        y_packed = jnp.transpose(y_chunks, (0, 1, 3, 2))
        y_packed = jnp.pad(y_packed, ((0, 0), (0, 0), (0, 5), (0, 0)))
        return y_packed.reshape(b, c * 8, S)

    t, y_packed = timed(jax.jit(pack_only), ys_p)
    print(f"packing alone:         {t:5.1f} ms")

    # kernel alone with precomputed ids/pack
    def kernel_only(chunk_ids_, xs_, y_packed_):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        b, np_, _ = xs_.shape
        n_tiles = np_ // cc._TN
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_tiles),
            in_specs=[
                pl.BlockSpec((1, cc._TN, 3), lambda b_, t_, *_: (b_, t_, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, cc._TN, 1), lambda b_, t_, *_: (b_, t_, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cc._TN, 1), lambda b_, t_, *_: (b_, t_, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((4, 8, S), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
        )
        d, i = jax.experimental.pallas.pallas_call(
            cc._nn_kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((b, np_, 1), jnp.float32),
                jax.ShapeDtypeStruct((b, np_, 1), jnp.int32),
            ],
        )(chunk_ids_, xs_, y_packed_)
        return d[..., 0], i[..., 0]

    t, _ = timed(jax.jit(kernel_only), chunk_ids, xs_p, y_packed)
    print(f"pallas kernel alone:   {t:5.1f} ms")

    # index unscramble + exact distance rederivation
    def post_only(i_sorted_, xperm_, yperm_, x_, y_):
        n = x_.shape[1]
        m = y_.shape[1]
        i_s = jnp.clip(i_sorted_[:, :n], 0, m - 1)
        i_orig_for_sorted_x = jnp.take_along_axis(yperm_, i_s, axis=1)
        i_orig = jnp.zeros((x_.shape[0], n), jnp.int32)
        i_orig = jax.vmap(lambda dest, src, vals: dest.at[src].set(vals))(
            i_orig, xperm_[:, :n], i_orig_for_sorted_x
        )
        take = jax.vmap(lambda arr, idx: arr[idx])
        d = jnp.sum((x_ - take(y_, i_orig)) ** 2, axis=-1)
        return d, i_orig

    t, _ = timed(jax.jit(post_only), i_sorted, xperm, yperm, x, y)
    print(f"unscramble+rederive:   {t:5.1f} ms")
    if args.section == "breakdown":
        return

    # ---- chunk-size variants (pair-shared sorts) ----
    for S_, T_ in ((128, 24), (128, 16), (256, 12), (256, 8)):
        t, _ = timed(
            jax.jit(lambda a, b, s=S_, tt=T_: cc.chamfer_distance_clustered(a, b, s, tt)),
            x, y,
        )
        tg, _ = timed(
            jax.jit(jax.grad(
                lambda a, b, s=S_, tt=T_: cc.chamfer_distance_clustered(a, b, s, tt).sum()
            )),
            x, y,
        )
        print(f"clustered S={S_:3d} T={T_:2d}:  fwd {t:6.1f} ms  grad {tg:6.1f} ms")

    # ---- mesh-level: 3-repeat CD (the training loss shape) ----
    from active_3d_vision_and_touch_tpu.ops.chamfer import mesh_chamfer_distance

    V = 2324
    verts = jnp.asarray(rng.normal(size=(16, V, 3)), jnp.float32) * 0.3
    faces = jnp.asarray(
        rng.integers(0, V, size=(4608, 3)).astype(np.int32)
    )
    key = jax.random.PRNGKey(0)
    for nn in ("exact", "clustered"):
        t, _ = timed(
            jax.jit(lambda v, g, k, nn=nn: mesh_chamfer_distance(
                v, faces, g, k, num=N, nn=nn)),
            verts, y, key,
        )
        tg, _ = timed(
            jax.jit(jax.grad(lambda v, g, k, nn=nn: mesh_chamfer_distance(
                v, faces, g, k, num=N, nn=nn).sum())),
            verts, y, key,
        )
        print(f"mesh 3-repeat {nn:9s}: fwd {t:6.1f} ms  grad {tg:6.1f} ms")


if __name__ == "__main__":
    main()
