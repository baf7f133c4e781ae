"""Clustered (pruned) nearest-neighbor Chamfer distance.

The exact brute-force kernel in :mod:`ops.chamfer` runs at VPU speed of
light, so going faster needs an algorithm, not a schedule.  This module
prunes the O(N·M) sweep with spatial locality:

1. both clouds are sorted along a Morton (Z-order) curve, so contiguous
   chunks of ``S`` reference points are spatially coherent,
2. every *query tile* (the Pallas tile of TN sorted queries) selects ``T``
   reference chunks by per-query vote: each query ranks chunks by the
   lower bound ||q - chunk_center|| - chunk_radius and votes for its top
   3; the tile scans the most-voted chunks (robust to Z-curve
   discontinuities, which break tile-centroid heuristics),
3. the Pallas kernel scans only those T chunks per tile: the chunk-id table
   rides in as a scalar-prefetch operand and chunks are double-buffer
   DMA'd from HBM — the pallas_guide scalar-prefetch + DMA pattern,
4. distances to the chosen neighbor are re-derived exactly in f32 outside,
   so pruning can only affect *which* neighbor is found, never the
   arithmetic of the value/gradient; for surface-like clouds the found
   neighbor matches brute force (validated in tests, tolerance-tested in
   the wrapper).

Work drops from N·M to N·(T·S + C) (e.g. 30k x 30k → ~10x less at the
default S=128, T=24).  At those defaults the found neighbors matched brute
force exactly on procedural surface clouds (tests).

Measured on v5e (round 1), 16 x 30k x 30k, vs the exact kernel:
153 → 135 ms fwd, 181 → 155 ms grad (~15% faster) after rewriting the
selection prep to stream per tile (the first version materialized a
0.5 GB bound/vote buffer and was 2x *slower*).  The 10x work reduction is
not yet realized because (a) per-chunk DMA latency dominates the tiny
(256x128) compute tiles and (b) the per-tile selection map is sequential.
A 4-deep DMA pipeline changed nothing (135.2 vs 135.3 ms) — the kernel
is not DMA-bound; the remaining ~90 ms lives in the XLA prep (Morton
argsorts, the sequential per-tile selection map, packing gathers).
Round-2 plan (ROADMAP): batch the tile selection, fuse it into a Pallas
prologue, reuse sort results across the two directions.  Until the win is
decisive the exact kernel stays the default (config ``loss_nn="exact"``).
Exactness is not guaranteed in the worst case — the exact kernel remains
the default for scoring; this one is the training-loss accelerator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TN = 256  # queries per tile

# Tile-selection cost knobs (A/B'd on-chip; see ROADMAP).  The per-query
# vote over the candidate pool is the dominant VPU cost of the clustered
# prep, and Morton-adjacent queries are spatial near-duplicates, so voting
# with every ``_VOTE_STRIDE``-th query scans the same chunk neighborhoods
# with 1/stride the bound work.  ``_CAND_FACTOR * T`` is the anchor-ranked
# candidate pool the vote runs over.
_VOTE_STRIDE = 1
_CAND_FACTOR = 3


def _part1by2(v: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits to every 3rd bit (int32 Morton helper)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def morton_codes(points: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) points → int32 Z-order codes on a 1024^3 lattice over
    [lo, hi] (per-batch bounds, broadcastable)."""
    scale = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(((points - lo) / scale * 1023.0), 0, 1023).astype(jnp.int32)
    return (
        _part1by2(q[..., 0])
        | (_part1by2(q[..., 1]) << 1)
        | (_part1by2(q[..., 2]) << 2)
    )


def _sort_by_morton(pts: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sort each batch's points along the Z-curve; returns (sorted, perm).

    One variadic stable lax.sort carries the iota AND the three coordinate
    planes alongside the codes — index-identical to argsort + gather (both
    are stable sorts on the same key), but the (B, N, 3) take_along_axis
    disappears (argsort is itself a (codes, iota) lax.sort, so the fused
    form sorts 3 extra payload operands instead of paying a separate
    gather's HBM round trip)."""
    lo = jnp.min(pts, axis=1, keepdims=True)
    hi = jnp.max(pts, axis=1, keepdims=True)
    codes = morton_codes(pts, lo, hi)  # (B, N)
    b, n = codes.shape
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    _, perm, sx, sy, sz = jax.lax.sort(
        (codes, iota, pts[..., 0], pts[..., 1], pts[..., 2]),
        dimension=1, num_keys=1, is_stable=True,
    )
    return jnp.stack([sx, sy, sz], axis=-1), perm


def _edge_pad_points(x, mult):
    """Pad the point axis to a multiple by repeating the last point — a
    constant far-away sentinel would poison tile/chunk centroids; harmless
    duplicates cannot change any minimum."""
    pad = (-x.shape[1]) % mult
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.broadcast_to(x[:, -1:, :], (x.shape[0], pad, 3))], axis=1
    )


def _nn_kernel(
    chunk_ids_ref, x_ref, y_hbm, d_ref, i_ref, scratch, sems, *, n_chunks,
    y_distinct=None,
):
    """One query tile: scan its T prefetched reference chunks.

    chunk_ids_ref: (B*n_tiles*T,) int32 scalar-prefetch, FLAT — SMEM
    operands lane-pad the trailing dimension to 128, so a (B, nt, T=24)
    layout would inflate 5.3x and overflow the 1 MB SMEM at training batch
    sizes (measured: u8[2949120] > 1 MB for B=48); the flat layout pads
    once.  x_ref (1, TN, 3) VMEM; y_hbm (B, C*8, S): chunk c occupies rows
    [8c, 8c+8) — the chunk's S points stored transposed (rows 0..2 = x/y/z
    planes, rows 3..7 pad) so manual DMA slices are sublane-aligned
    (Mosaic rejects slicing a 3-wide trailing dim).  scratch (n_buf, 8, S)
    DMA pipeline; d/i (1, TN, 1) outputs — the (TN, S) distance layout
    keeps the min-reduce on lanes and the per-query results on sublanes,
    with no transposes.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    s = scratch.shape[2]
    x = x_ref[0]  # (TN, 3)
    tn = x.shape[0]
    base_flat = (b * n_tiles + t) * n_chunks
    # y_distinct: the reference pack holds only the distinct clouds (the
    # 3-repeat loss tiles the same gt); fold the batch index back onto it
    y_row = b if y_distinct is None else jax.lax.rem(b, y_distinct)

    def chunk_dma(slot, j):
        cid = chunk_ids_ref[base_flat + j]
        return pltpu.make_async_copy(
            y_hbm.at[y_row, pl.ds(cid * 8, 8), :],
            scratch.at[slot],
            sems.at[slot],
        )

    n_buf = scratch.shape[0]
    for w in range(n_buf - 1):
        if w < n_chunks:
            chunk_dma(w % n_buf, w).start()

    def body(j, carry):
        d_best, i_best = carry
        slot = j % n_buf

        @pl.when(j + n_buf - 1 < n_chunks)
        def _():
            chunk_dma((j + n_buf - 1) % n_buf, j + n_buf - 1).start()

        chunk_dma(slot, j).wait()
        y = scratch[slot]  # (8, S); rows 0..2 are coordinate planes
        dist = jnp.zeros((tn, s), jnp.float32)
        for c in range(3):
            diff = x[:, c : c + 1] - y[c : c + 1, :]
            dist = dist + diff * diff
        local_d = jnp.min(dist, axis=1, keepdims=True)  # (TN, 1)
        base = chunk_ids_ref[base_flat + j] * s
        local_i = (
            jnp.argmin(dist, axis=1).reshape(-1, 1).astype(jnp.int32) + base
        )
        better = local_d < d_best
        return jnp.where(better, local_d, d_best), jnp.where(better, local_i, i_best)

    d0 = jnp.full((tn, 1), 1e30, jnp.float32)
    i0 = jnp.zeros((tn, 1), jnp.int32)
    d, i = jax.lax.fori_loop(0, n_chunks, body, (d0, i0))
    d_ref[0] = d
    i_ref[0] = i


def _nn_clustered_sorted(
    xs: jnp.ndarray,  # (B, Np, 3) Morton-sorted, padded queries
    ys: jnp.ndarray,  # (B, C*S, 3) Morton-sorted, padded references
    chunk_size: int,
    chunks_per_tile: int,
    interpret: bool = False,
    y_distinct: int | None = None,
):
    """Min (distance approx, argmin-into-sorted-y) for sorted inputs.

    ``y_distinct=k`` declares that ys is a tiling of its first k rows
    (ys[i] == ys[i % k]): the chunk packing + chunk stats — per-direction
    prep costs second only to the Morton sort — are computed once for the
    k distinct clouds; the kernel folds the batch index with a modulo."""
    b, np_, _ = xs.shape
    c = ys.shape[1] // chunk_size
    n_tiles = np_ // _TN
    t_sel = min(chunks_per_tile, c)
    yd = y_distinct if y_distinct is not None else b

    # Per-tile chunk selection by per-query vote.  A tile of Morton-sorted
    # queries can straddle a Z-curve discontinuity, so a tile-centroid
    # heuristic misses the minority side badly.  Instead every query ranks
    # all chunks by the lower bound ||q - chunk_c|| - chunk_r, votes for
    # its top-3, and the tile scans the T most-voted chunks (vote counts
    # tie-broken toward chunks near the tile centroid).  Processed one
    # tile at a time under lax.map so the (N, C) bound matrix and vote
    # one-hots never materialize (a (16, 30k, 236) f32 buffer is ~0.5 GB
    # and dominated the end-to-end time when materialized).
    #
    # Votes are gathered with k iterated argmin+mask passes and one-hot
    # compare-sums instead of a per-query top_k + scatter-add (top_k over
    # the chunk axis lowers to a sort, and the scatter serializes; argmin
    # and broadcast-compare are plain VPU reductions).
    y_chunks = ys[:yd].reshape(yd, c, chunk_size, 3)
    chunk_c1 = jnp.mean(y_chunks, axis=2)  # (yd, C, 3)
    chunk_r1 = jnp.sqrt(
        jnp.max(jnp.sum((y_chunks - chunk_c1[:, :, None, :]) ** 2, axis=-1), axis=2)
    )  # (yd, C)
    reps = b // yd
    chunk_c = jnp.tile(chunk_c1, (reps, 1, 1)) if reps > 1 else chunk_c1
    chunk_r = jnp.tile(chunk_r1, (reps, 1)) if reps > 1 else chunk_r1

    x_tiles = jnp.moveaxis(xs.reshape(b, n_tiles, _TN, 3), 1, 0)  # (nt, B, TN, 3)
    # Candidate pre-filter: the per-query vote is the dominant selection
    # cost (a (B, TN, C) bound tensor per tile).  8 anchor queries spread
    # across the Morton-sorted tile (stride TN/8) rank all C chunks by
    # min-over-anchors bound, and the vote then runs over only the best
    # K = 3T candidates — ~C/K (~3x at 30k) less VPU work.  Anchors, not
    # the tile centroid: a tile straddling a Z-curve discontinuity has
    # queries in several distant regions, and min-over-anchors keeps every
    # region's nearby chunks in the candidate set (the centroid bound
    # alone misses the minority side — the original design note).
    k_cand = min(_CAND_FACTOR * t_sel, c)
    k_vote = min(3, k_cand)
    cand_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, k_cand), 2)

    def tile_select(x_full):  # (B, TN, 3)
        # voters: a stride over the Morton-sorted tile (spatial coverage is
        # preserved; only near-duplicate voters are dropped)
        x_tile = x_full[:, :: _VOTE_STRIDE, :] if _VOTE_STRIDE > 1 else x_full
        if k_cand < c:
            anchors = x_full[:, :: _TN // 8, :]  # (B, 8, 3)
            a_bound = (
                jnp.sqrt(
                    jnp.sum(
                        (anchors[:, :, None, :] - chunk_c[:, None, :, :]) ** 2,
                        axis=-1,
                    )
                )
                - chunk_r[:, None, :]
            ).min(axis=1)  # (B, C)
            _, cand = jax.lax.top_k(-a_bound, k_cand)  # (B, K)
            cand = cand.astype(jnp.int32)
            cc = jnp.take_along_axis(chunk_c, cand[..., None], axis=1)  # (B, K, 3)
            cr = jnp.take_along_axis(chunk_r, cand, axis=1)  # (B, K)
        else:
            cand, cc, cr = None, chunk_c, chunk_r
        q_bound = (
            jnp.sqrt(
                jnp.sum((x_tile[:, :, None, :] - cc[:, None, :, :]) ** 2, axis=-1)
            )
            - cr[:, None, :]
        )  # (B, TN, K)
        votes = jnp.zeros((b, k_cand), jnp.float32)
        for _ in range(k_vote):
            onehot = (
                jnp.argmin(q_bound, axis=-1)[:, :, None] == cand_iota
            )  # (B, TN, K)
            votes = votes + jnp.sum(onehot, axis=1, dtype=jnp.float32)
            q_bound = jnp.where(onehot, jnp.inf, q_bound)
        tile_c = jnp.mean(x_full, axis=1)  # (B, 3)
        tile_bound = (
            jnp.sqrt(jnp.sum((tile_c[:, None, :] - cc) ** 2, axis=-1)) - cr
        )
        score = votes + 1.0 / (1.0 + jnp.maximum(tile_bound, 0.0))
        _, ids = jax.lax.top_k(score, t_sel)  # (B, T) — small, K-wide only
        ids = ids.astype(jnp.int32)
        if cand is not None:
            ids = jnp.take_along_axis(cand, ids, axis=1)
        return ids

    chunk_ids = jnp.moveaxis(jax.lax.map(tile_select, x_tiles), 0, 1)  # (B, nt, T)

    # pack chunks transposed: (yd, C, S, 3) → (yd, C, 8, S) → (yd, C*8, S)
    # — only the distinct clouds; the kernel DMAs row b % yd
    y_packed = jnp.transpose(y_chunks, (0, 1, 3, 2))  # (yd, C, 3, S)
    y_packed = jnp.pad(y_packed, ((0, 0), (0, 0), (0, 5), (0, 0)))
    y_packed = y_packed.reshape(yd, c * 8, chunk_size)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, _TN, 3), lambda b_, t_, *_: (b_, t_, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # packed y stays in HBM
        ],
        out_specs=[
            pl.BlockSpec(
                (1, _TN, 1), lambda b_, t_, *_: (b_, t_, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, _TN, 1), lambda b_, t_, *_: (b_, t_, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, 8, chunk_size), jnp.float32),  # 4-deep DMA pipeline
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    d, i = pl.pallas_call(
        functools.partial(
            _nn_kernel,
            n_chunks=t_sel,
            y_distinct=None if yd == b else yd,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, np_, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, np_, 1), jnp.int32),
        ],
        interpret=interpret,
    )(chunk_ids.reshape(-1), xs, y_packed)
    return d[..., 0], i[..., 0]


def _unscramble(i_sorted, xperm, yperm, x, y):
    """Sorted-frame NN indices → original-frame (distance, index)."""
    b, n, _ = x.shape
    m = y.shape[1]
    i_sorted = jnp.clip(i_sorted[:, :n], 0, m - 1)
    i_orig_for_sorted_x = jnp.take_along_axis(yperm, i_sorted, axis=1)
    # re-scatter to the original x order
    i_orig = jnp.zeros((b, n), jnp.int32)
    i_orig = jax.vmap(lambda dest, src, vals: dest.at[src].set(vals))(
        i_orig, xperm[:, :n], i_orig_for_sorted_x
    )
    # exact distances in the original frame
    take = jax.vmap(lambda arr, idx: arr[idx])
    d = jnp.sum((x - take(y, i_orig)) ** 2, axis=-1)
    return d, i_orig


def min_dists_clustered(
    x: jnp.ndarray,
    y: jnp.ndarray,
    chunk_size: int = 128,
    chunks_per_tile: int = 24,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B,N,3),(B,M,3) → per-query (B,N) exact squared distance to the
    found neighbor and its index into the ORIGINAL y ordering."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    xs, xperm = _sort_by_morton(x)
    ys, yperm = _sort_by_morton(y)
    xs = _edge_pad_points(xs, _TN)
    ys = _edge_pad_points(ys, chunk_size)

    _, i_sorted = _nn_clustered_sorted(
        xs, ys, chunk_size, chunks_per_tile, interpret
    )
    return _unscramble(i_sorted, xperm, yperm, x, y)


def _pair_min_dists_sorted(
    x, y, chunk_size, chunks_per_tile, interpret=None, y_sorted=None,
    y_distinct=None, sort_x=True,
):
    """Both sweep directions off ONE Morton sort per cloud, everything in
    the SORTED frame: the CD value is a mean over queries, so it never
    needs the original ordering — skipping the per-direction index
    unscramble (a (B,N) gather + scatter each) moves that cost to a single
    permutation application in the backward pass.

    ``y_sorted=(ys, yperm)`` skips the y-side sort — the 3-repeat training
    loss tiles the SAME gt cloud across repeats, and the Morton argsort is
    the single most expensive prep stage (34 ms per 16-cloud batch at 30k
    points, scripts/profile_chamfer.py), so sorting the 16 distinct clouds
    and tiling the sorted result saves ~2/3 of the y-side sort cost."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert _TN % chunk_size == 0, (
        f"chunk_size {chunk_size} must divide the query tile {_TN} so one "
        "padding serves both roles"
    )
    n, m = x.shape[1], y.shape[1]
    if sort_x:
        xs, xperm = _sort_by_morton(x)
    else:
        # mesh-sampled queries arrive in face order — chart-local and
        # spatially coherent per query tile already; the per-query chunk
        # vote absorbs the residual disorder (agreement measured in
        # tests/test_chamfer_cluster.py::test_face_order_queries)
        xs = x
        xperm = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[None], (x.shape[0], n)
        )
    ys, yperm = y_sorted if y_sorted is not None else _sort_by_morton(y)
    xs_p = _edge_pad_points(xs, _TN)
    ys_p = _edge_pad_points(ys, _TN)

    _, ix_s = _nn_clustered_sorted(
        xs_p, ys_p, chunk_size, chunks_per_tile, interpret,
        y_distinct=y_distinct,
    )
    _, iy_s = _nn_clustered_sorted(ys_p, xs_p, chunk_size, chunks_per_tile, interpret)
    ix_s = jnp.clip(ix_s[:, :n], 0, m - 1)
    iy_s = jnp.clip(iy_s[:, :m], 0, n - 1)

    take = jax.vmap(lambda arr, idx: arr[idx])
    # exact distances re-derived in f32 (pruning only affects WHICH
    # neighbor is found, never the arithmetic), sorted frame
    dx_s = jnp.sum((xs - take(ys, ix_s)) ** 2, axis=-1)  # (B, n)
    dy_s = jnp.sum((ys - take(xs, iy_s)) ** 2, axis=-1)  # (B, m)
    return (xs, ys, ix_s, iy_s, xperm, yperm), dx_s, dy_s


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def chamfer_distance_clustered(
    x: jnp.ndarray,
    y: jnp.ndarray,
    chunk_size: int = 128,
    chunks_per_tile: int = 24,
):
    """Symmetric Chamfer distance via the pruned NN search (training-loss
    accelerator; use :func:`ops.chamfer.chamfer_distance` for scoring)."""
    _, dx_s, dy_s = _pair_min_dists_sorted(x, y, chunk_size, chunks_per_tile)
    return jnp.mean(dx_s, axis=1) + jnp.mean(dy_s, axis=1)


def _fwd(x, y, chunk_size, chunks_per_tile):
    res, dx_s, dy_s = _pair_min_dists_sorted(x, y, chunk_size, chunks_per_tile)
    return jnp.mean(dx_s, axis=1) + jnp.mean(dy_s, axis=1), res


def _bwd(chunk_size, chunks_per_tile, res, g):
    """Standard chamfer VJP, emitted as ONE sorted-segment accumulation per
    cloud (ops/segsum) instead of XLA scatters.

    Each cloud's cotangent is a sum of two index-addressed streams — its own
    per-query term and the cross term from the other direction's queries.
    Both are expressed with ORIGINAL-frame indices (the sorted→original
    permutation is folded into the index stream by a cheap int gather), so
    the sorted-frame unsort scatter disappears entirely; the fused
    (n+m)-entry stream then feeds a single sort + Pallas segment kernel.
    Measured (B=48, 30k²): grad-x overhead over fwd 125 ms → ~55 ms vs the
    scatter/unsort form.
    """
    from active_3d_vision_and_touch_tpu.ops.segsum import scatter_add_3

    xs, ys, ix_s, iy_s, xperm, yperm = res
    n, m = xs.shape[1], ys.shape[1]
    gx = (g / n)[:, None, None]
    gy = (g / m)[:, None, None]

    take = jax.vmap(lambda arr, idx: arr[idx])
    y_near = take(ys, ix_s)  # (B, n, 3)
    x_near = take(xs, iy_s)  # (B, m, 3)

    diff1 = gx * 2.0 * (xs - y_near)  # (B, n, 3) d/dxs of direction 1
    diff2 = gy * 2.0 * (ys - x_near)  # (B, m, 3) d/dys of direction 2

    idx_x = jnp.concatenate([xperm, take(xperm, iy_s)], axis=1)  # (B, n+m)
    val_x = jnp.concatenate([diff1, -diff2], axis=1)
    idx_y = jnp.concatenate([yperm, take(yperm, ix_s)], axis=1)
    val_y = jnp.concatenate([diff2, -diff1], axis=1)
    return scatter_add_3(idx_x, val_x, n), scatter_add_3(idx_y, val_y, m)


chamfer_distance_clustered.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def chamfer_clustered_tiled_gt(
    x: jnp.ndarray,
    y: jnp.ndarray,
    repeat: int,
    chunk_size: int = 128,
    chunks_per_tile: int = 24,
):
    """Clustered CD where x is (R·B, N, 3) predictions and y is the (B, M,
    3) ground-truth cloud shared by the R repeats (the 3-repeat training
    loss, ``ops.chamfer.mesh_chamfer_distance``).  Equivalent to
    ``chamfer_distance_clustered(x, tile(y, R))`` but Morton-sorts the B
    distinct gt clouds once and tiles the SORTED result — the sort is the
    dominant prep cost (profile_chamfer.py).  Gradient flows to x only
    (gt is data in every caller); the y cotangent is returned as zeros.
    """
    cd, _ = _tiled_fwd(x, y, repeat, chunk_size, chunks_per_tile)
    return cd


def _tiled_fwd(x, y, repeat, chunk_size, chunks_per_tile):
    ys1, yperm1 = _sort_by_morton(y)
    ys = jnp.tile(ys1, (repeat, 1, 1))
    yperm = jnp.tile(yperm1, (repeat, 1))
    res, dx_s, dy_s = _pair_min_dists_sorted(
        x, ys, chunk_size, chunks_per_tile, y_sorted=(ys, yperm),
        y_distinct=y.shape[0],
    )
    return jnp.mean(dx_s, axis=1) + jnp.mean(dy_s, axis=1), (res, y.shape)


def _tiled_bwd(repeat, chunk_size, chunks_per_tile, resy, g):
    from active_3d_vision_and_touch_tpu.ops.segsum import scatter_add_3

    res, y_shape = resy
    xs, ys, ix_s, iy_s, xperm, yperm = res
    n, m = xs.shape[1], ys.shape[1]
    gx = (g / n)[:, None, None]
    gy = (g / m)[:, None, None]

    take = jax.vmap(lambda arr, idx: arr[idx])
    y_near = take(ys, ix_s)
    x_near = take(xs, iy_s)
    diff1 = gx * 2.0 * (xs - y_near)
    diff2 = gy * 2.0 * (ys - x_near)

    idx_x = jnp.concatenate([xperm, take(xperm, iy_s)], axis=1)
    val_x = jnp.concatenate([diff1, -diff2], axis=1)
    dx = scatter_add_3(idx_x, val_x, n)
    return dx, jnp.zeros(y_shape, x_near.dtype)


chamfer_clustered_tiled_gt.defvjp(_tiled_fwd, _tiled_bwd)
