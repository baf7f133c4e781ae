"""Sorted-stream segment accumulation — the TPU answer to scatter-add.

XLA lowers ``zeros.at[idx].add(val)`` on TPU to a serialized scatter; at the
chamfer-backward shape (B=48, 30k colliding updates into 30k rows) that is
~92 ms/step — the single largest item left in the training step (ROADMAP
round-3 #1).  The sort-free alternatives measured worse: a cumsum +
``searchsorted`` prefix-difference chain is 270 ms (the 30k-wide binary
search is gather-bound), while a joint ``lax.sort`` of (idx, val) is
essentially free.  So: sort once, then accumulate the *sorted* stream with
a Pallas kernel.

Kernel shape: the output is tiled along the segment axis (``TO`` segments
per grid step).  Because the stream is sorted by segment id, the entries
feeding one output tile form a contiguous window; window bounds come from a
*tiny* ``searchsorted`` (one query per tile boundary, ~60 per batch row, vs
30k in the naive prefix scheme) and ride into the kernel as scalar-prefetch
operands.  Each grid step DMAs its window chunk-by-chunk from HBM (values
and float-encoded ids packed in one (8, W) plane so a chunk is a single
sublane-aligned copy) and accumulates ``out[r] += (id == r) * val`` with
plain VPU compare + multiply + lane-reduce.  Entries of a chunk that spill
outside the tile's segment range match nothing and contribute zero, so no
masking is needed — alignment padding is free.

Used by the chamfer backward (``ops/chamfer.py``, ``ops/chamfer_cluster.py``)
where the reference's CUDA kernel relies on ``atomicAdd``
(pytorch3d ``knn_backward``); TPU has no atomics — sorted windows replace
them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TO = 512  # segments (output rows) per grid step
_W = 512  # stream entries per DMA chunk


def _kernel(bounds_ref, packed_hbm, out_ref, scratch, sem, *, n_tiles, mp):
    b = pl.program_id(0)
    t = pl.program_id(1)
    base = t * _TO
    lo = bounds_ref[b * (n_tiles + 1) + t]
    hi = bounds_ref[b * (n_tiles + 1) + t + 1]
    lo_al = (lo // _W) * _W
    n_chunks = (hi - lo_al + _W - 1) // _W

    seg_iota = (
        jax.lax.broadcasted_iota(jnp.int32, (_TO, 1), 0) + base
    ).astype(jnp.float32)  # (TO, 1) segment ids of this tile

    def body(j, acc):
        cid = jnp.minimum(lo_al // _W + j, mp // _W - 1)
        cp = pltpu.make_async_copy(packed_hbm.at[b, cid], scratch, sem)
        cp.start()
        cp.wait()
        ids = scratch[3:4, :]  # (1, W) segment ids, exact in f32
        match = (seg_iota == ids).astype(jnp.float32)  # (TO, W)
        cols = []
        for c in range(3):
            cols.append(jnp.sum(match * scratch[c : c + 1, :], axis=1, keepdims=True))
        return acc + jnp.concatenate(cols, axis=1)  # (TO, 3)

    acc = jnp.zeros((_TO, 3), jnp.float32)
    out_ref[0] = jax.lax.fori_loop(0, n_chunks, body, acc)


def segment_accumulate_sorted(
    idx_sorted: jnp.ndarray,
    vals_sorted: jnp.ndarray,
    num_segments: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(B, M) sorted int32 ids + (B, M, 3) values → (B, num_segments, 3)
    with out[b, s] = Σ_{i: idx[b,i]=s} vals[b, i].  Ids must be sorted
    ascending per row; out-of-range ids (≥ num_segments) are dropped — ids
    in [num_segments, n_tiles*TO) accumulate into padded rows that the
    final slice discards, larger ids match no tile window at all."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, m = idx_sorted.shape
    assert num_segments < (1 << 24), "segment ids must be exact in f32"

    mp = ((m + _W - 1) // _W) * _W
    mp = max(mp, _W)
    n_tiles = (num_segments + _TO - 1) // _TO
    np_ = n_tiles * _TO

    # pack values + float-encoded ids into one (B, 8, Mp) plane so each
    # window chunk is a single sublane-aligned (8, W) DMA; tail entries get
    # an id that matches no tile
    pad = mp - m
    idx_f = jnp.pad(
        idx_sorted.astype(jnp.float32), ((0, 0), (0, pad)), constant_values=np_
    )
    vals_t = jnp.pad(
        jnp.transpose(vals_sorted, (0, 2, 1)).astype(jnp.float32),
        ((0, 0), (0, 0), (0, pad)),
    )  # (B, 3, Mp)
    packed = jnp.concatenate(
        [vals_t, idx_f[:, None, :], jnp.zeros((b, 4, mp), jnp.float32)], axis=1
    )  # (B, 8, Mp)
    # chunk-major layout: one window chunk = one leading-index DMA slice
    packed = jnp.transpose(packed.reshape(b, 8, mp // _W, _W), (0, 2, 1, 3))

    # window bounds: one searchsorted query per tile boundary (tiny)
    tile_edges = jnp.arange(n_tiles + 1, dtype=idx_sorted.dtype) * _TO
    bounds = jax.vmap(lambda row: jnp.searchsorted(row, tile_edges, side="left"))(
        idx_sorted
    ).astype(jnp.int32)  # (B, n_tiles+1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, _TO, 3), lambda b_, t_, *_: (b_, t_, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((8, _W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_tiles=n_tiles, mp=mp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, np_, 3), jnp.float32),
        interpret=interpret,
    )(bounds.reshape(-1), packed)
    return out[:, :num_segments, :]


def scatter_add_3(
    idx: jnp.ndarray,
    vals: jnp.ndarray,
    num_segments: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in for ``zeros((S,3)).at[idx].add(vals)`` batched over B:
    joint sort of (idx, vals) — measured ~free on TPU — then the sorted
    segment kernel."""
    dtype = vals.dtype
    v = vals.astype(jnp.float32)
    idx_s, v0, v1, v2 = jax.lax.sort(
        (idx, v[..., 0], v[..., 1], v[..., 2]), dimension=1, num_keys=1
    )
    out = segment_accumulate_sorted(
        idx_s, jnp.stack([v0, v1, v2], axis=-1), num_segments, interpret
    )
    return out.astype(dtype)
