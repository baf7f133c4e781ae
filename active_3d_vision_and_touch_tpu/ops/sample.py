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


def batch_sample(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    key: jax.Array,
    num: int = 10000,
) -> jnp.ndarray:
    """Sample ``num`` points per mesh, proportional to face area.

    verts: (B, V, 3) float, faces: (F, 3) int (shared across the batch),
    returns (B, num, 3).
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
    u_face = jax.random.uniform(k_face, (b, num), dtype=verts.dtype)
    idx = _inverse_cdf(cdf, u_face)
    idx = jnp.clip(idx, 0, faces.shape[0] - 1)

    tri = jnp.take(faces, idx, axis=0)  # (B, num, 3)
    gather = jax.vmap(lambda v, t: v[t])  # (V,3),(num,3)->(num,3,3)
    pts = gather(verts, tri)  # (B, num, 3 verts, 3 xyz)

    u = jax.random.uniform(k_u, (b, num, 1), dtype=verts.dtype)
    v = jax.random.uniform(k_v, (b, num, 1), dtype=verts.dtype)
    su = jnp.sqrt(u)
    w0, w1, w2 = 1.0 - su, su * (1.0 - v), su * v
    return w0 * pts[:, :, 0] + w1 * pts[:, :, 1] + w2 * pts[:, :, 2]
