"""Differentiable area-weighted surface sampling of a batch of meshes.

TPU-native replacement for the PyTorch3D CUDA sampling pipeline the
reference leans on (``utility/utils.py:152-187``: ``mesh_face_areas_normals``
+ ``multinomial`` + ``_rand_barycentric_coords``):

- face areas from the cross product (computed under stop_gradient, like the
  reference's ``torch.no_grad`` block),
- multinomial-with-replacement face selection via inverse-CDF
  (cumsum + searchsorted) with JAX PRNG — static shapes, no host sync,
- barycentric coordinates w0 = 1-sqrt(u), w1 = sqrt(u)(1-v), w2 = sqrt(u)v.

Gradients flow to vertex positions through the barycentric combination.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def face_areas(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """(B, V, 3), (F, 3) → (B, F) triangle areas."""
    v0 = jnp.take(verts, faces[:, 0], axis=1)
    v1 = jnp.take(verts, faces[:, 1], axis=1)
    v2 = jnp.take(verts, faces[:, 2], axis=1)
    cross = jnp.cross(v1 - v0, v2 - v0)
    return 0.5 * jnp.linalg.norm(cross, axis=-1)


def _inverse_cdf(cdf: jnp.ndarray, u: jnp.ndarray, chunk: int = 1024) -> jnp.ndarray:
    """searchsorted(cdf, u, side='right') as a count reduction.

    idx_j = #{f : cdf_f <= u_j} — a fused compare+sum over the (small) face
    dimension is ~10x faster on the TPU VPU than the gather-bound binary
    search ``jnp.searchsorted`` lowers to (58ms → ~5ms at 16x30k queries
    over ~2.4k faces).
    """
    b, n = u.shape
    pad = (-n) % chunk
    up = jnp.pad(u, ((0, 0), (0, pad)), constant_values=0.0)
    uc = jnp.moveaxis(up.reshape(b, -1, chunk), 1, 0)  # (nc, B, chunk)

    def count(u_chunk):  # (B, chunk)
        return jnp.sum(
            (u_chunk[:, :, None] >= cdf[:, None, :]).astype(jnp.int32), axis=-1
        )

    idx = jax.lax.map(count, uc)  # (nc, B, chunk)
    return jnp.moveaxis(idx, 0, 1).reshape(b, -1)[:, :n]


def _inverse_cdf_sorted(cdf: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Exact ``#{f : cdf_f <= u_j}`` for per-row SORTED queries ``u``.

    Run-length decode instead of the O(n·F) compare-sum of
    :func:`_inverse_cdf`: with u ascending, face f covers exactly the query
    positions i >= N_f where N_f = #{j : u_j < cdf_f} (one (B, F) binary
    search of the big sorted axis), so idx_i = #{f : N_f <= i} — ones
    scattered at the (tiny, F-per-row) run starts, then a cumsum over the
    sample axis.  Ties (u == cdf_f) count the face, matching the >= compare
    of _inverse_cdf exactly.  Measured ~6x faster at 16x90k queries over
    2.4k faces (the train-step shape); used whenever the caller guarantees
    sorted queries (batch_sample always does — see _sorted_uniforms).
    """
    b, n = u.shape
    counts = jax.vmap(lambda ur, cr: jnp.searchsorted(ur, cr, side="left"))(
        u, cdf
    ).astype(jnp.int32)  # (B, F): N_f
    z = jax.vmap(lambda cr: jnp.zeros(n + 1, jnp.int32).at[cr].add(1))(counts)
    return jnp.cumsum(z, axis=1)[:, :n]


def _sorted_uniforms(key: jax.Array, shape, dtype) -> jnp.ndarray:
    """Uniform order statistics WITHOUT a sort: normalized cumulative sums
    of exponential gaps (u_(i) = Σ_{j<=i} E_j / Σ_{j<=n} E_j).  Sampling is
    exchangeable — the points form a set — so drawing the face uniforms
    pre-sorted is distributionally identical, and it makes the face
    indices MONOTONE, which turns the backward scatter-add into a prefix
    -sum segment reduction (see :func:`_interpolate`)."""
    b, n = shape
    e = -jnp.log1p(-jax.random.uniform(key, (b, n + 1), dtype=dtype))
    c = jnp.cumsum(e, axis=1)
    return c[:, :n] / c[:, n:]


def _gather_corners(verts, idx, faces):
    """(B, num, 3 corners, 3 xyz) corner positions for each sampled face.

    One row-gather from a per-batch (F, 9) packed corner table instead of
    three per-corner vertex gathers: the table build is a tiny F·9 gather,
    and the big num-sized gather then moves 9 contiguous elements per
    index, which the TPU gathers ~2x faster than scattered (3, 3) picks.
    """
    b = verts.shape[0]
    f = faces.shape[0]
    corners = jax.vmap(lambda v: v[faces.reshape(-1)])(verts)  # (B, F*3, 3)
    table = corners.reshape(b, f, 9)
    rows = jax.vmap(lambda t, i: t[i])(table, idx)  # (B, num, 9)
    return rows.reshape(b, idx.shape[1], 3, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _interpolate(verts, idx, w, faces):
    """pts_i = Σ_k w_i[k] · verts[faces[idx_i], k] for SORTED idx.

    Forward is a packed row-gather + a weighted sum.  The custom backward
    avoids the (num → V) scatter-add XLA would emit (30–90k colliding
    updates into ~2.3k vertices serialize badly on TPU): with idx sorted,
    per-face gradient sums are prefix-sum differences at the face
    boundaries, and only a tiny (F, 3) scatter remains.
    """
    pts = _gather_corners(verts, idx, faces)  # (B, num, 3, 3)
    # elementwise weighted sum — an einsum here dispatches a degenerate
    # (3-contraction) matmul that measured ~40 ms slower at 90k points
    return jnp.sum(w[..., None] * pts, axis=2)


def _interpolate_fwd(verts, idx, w, faces):
    pts = _gather_corners(verts, idx, faces)  # (B, num, 3, 3)
    out = jnp.sum(w[..., None] * pts, axis=2)
    # keep the gathered corner positions as a residual: dw needs them, and
    # re-gathering (B, num, 3) rows twice in the backward costs more than
    # carrying the residual at training shapes
    return out, (verts, pts, idx, w)


def _interpolate_bwd(faces, res, g):
    verts, pts, idx, w = res
    b, num, _ = g.shape
    f = faces.shape[0]
    v = verts.shape[1]
    # segment sums over the sorted face-index runs: for each face f and
    # corner k, Σ_{i: idx_i = f} w_i[k] · g_i
    contrib = w[..., None] * g[:, :, None, :]  # (B, num, 3 corners, 3 xyz)
    prefix = jnp.cumsum(contrib, axis=1)
    prefix = jnp.concatenate([jnp.zeros_like(prefix[:, :1]), prefix], axis=1)
    # run boundaries: lo_f = #{idx < f}; idx is sorted, so this is a
    # binary search of the (small) face axis into the sample axis
    face_iota = jnp.arange(f + 1, dtype=idx.dtype)
    bounds = jax.vmap(
        lambda row: jnp.searchsorted(row, face_iota, side="left")
    )(idx)  # (B, F+1)
    lo = bounds[:, :-1]
    hi = bounds[:, 1:]
    take = jax.vmap(lambda p, i: p[i])
    seg = take(prefix, hi) - take(prefix, lo)  # (B, F, 3 corners, 3 xyz)
    # tiny final scatter: F·3 adds into (V, 3)
    dverts = jax.vmap(
        lambda s: jnp.zeros((v, 3), verts.dtype)
        .at[faces[:, 0]].add(s[:, 0])
        .at[faces[:, 1]].add(s[:, 1])
        .at[faces[:, 2]].add(s[:, 2])
    )(seg)
    # elementwise + reduce, not einsum: a 3-length contraction dispatches a
    # degenerate matmul (same pitfall as the forward's weighted sum)
    dw = jnp.sum(g[:, :, None, :] * pts, axis=-1)
    return dverts, None, dw


_interpolate.defvjp(_interpolate_fwd, _interpolate_bwd)


def batch_sample(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    key: jax.Array,
    num: int = 10000,
) -> jnp.ndarray:
    """Sample ``num`` points per mesh, proportional to face area.

    verts: (B, V, 3) float, faces: (F, 3) int (shared across the batch),
    returns (B, num, 3).

    The gather/scatter structure here was measured CHEAPER than an MXU
    one-hot-matmul Pallas formulation (r3: 44 vs 226 ms fwd+bwd at 16x90k
    draws over 2.6k faces — tiny-M matmuls + per-tile one-hot construction
    lose to XLA's gather + the sorted-prefix backward).  See ROADMAP.
    """
    b = verts.shape[0]
    k_face, k_u, k_v = jax.random.split(key, 3)

    areas = jax.lax.stop_gradient(face_areas(verts, faces))
    areas = jnp.where(jnp.isnan(areas), 0.0, jnp.abs(areas))
    total = jnp.sum(areas, axis=1, keepdims=True)
    probs = jnp.where(total > 0, areas / jnp.maximum(total, 1e-30), 0.0)
    # degenerate all-zero-area mesh: fall back to uniform (reference sets
    # NaN rows to 1, utils.py:168)
    probs = jnp.where(total > 0, probs, 1.0 / probs.shape[1])

    cdf = jnp.cumsum(probs, axis=1)
    u_face = _sorted_uniforms(k_face, (b, num), verts.dtype)
    idx = _inverse_cdf_sorted(cdf, u_face)  # monotone non-decreasing per row
    idx = jnp.clip(idx, 0, faces.shape[0] - 1)

    u = jax.random.uniform(k_u, (b, num, 1), dtype=verts.dtype)
    v = jax.random.uniform(k_v, (b, num, 1), dtype=verts.dtype)
    su = jnp.sqrt(u)
    w = jnp.concatenate([1.0 - su, su * (1.0 - v), su * v], axis=-1)
    return _interpolate(verts, idx, w, faces)
