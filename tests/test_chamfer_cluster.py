import jax
import jax.numpy as jnp
import numpy as np

from active_3d_vision_and_touch_tpu.data import random_object
from active_3d_vision_and_touch_tpu.ops import batch_sample, chamfer_distance
from active_3d_vision_and_touch_tpu.ops.chamfer import _min_dists_xla
from active_3d_vision_and_touch_tpu.ops.chamfer_cluster import (
    chamfer_distance_clustered,
    min_dists_clustered,
    morton_codes,
)


def _surface_clouds(n=1024, m=1100):
    obj = random_object(2)
    verts = jnp.asarray(obj.verts)[None].repeat(2, 0)
    faces = jnp.asarray(obj.faces)
    x = batch_sample(verts, faces, jax.random.PRNGKey(0), num=n)
    y = batch_sample(verts * 1.01, faces, jax.random.PRNGKey(1), num=m)
    return x, y


def test_morton_locality():
    pts = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 512, 3)), jnp.float32)
    lo = pts.min(axis=1, keepdims=True)
    hi = pts.max(axis=1, keepdims=True)
    codes = np.asarray(morton_codes(pts, lo, hi))[0]
    order = np.argsort(codes)
    sorted_pts = np.asarray(pts[0])[order]
    # consecutive Z-order points are close on average vs random pairs
    consecutive = np.linalg.norm(np.diff(sorted_pts, axis=0), axis=1).mean()
    random_pairs = np.linalg.norm(
        sorted_pts[:-1] - sorted_pts[np.random.permutation(511)], axis=1
    ).mean()
    assert consecutive < 0.5 * random_pairs


def test_clustered_matches_bruteforce_on_surfaces():
    x, y = _surface_clouds()
    d_ref, i_ref = _min_dists_xla(x, y)
    d_cl, i_cl = min_dists_clustered(x, y, chunk_size=64, chunks_per_tile=16)
    match = np.isclose(np.asarray(d_cl), np.asarray(d_ref), rtol=1e-5, atol=1e-10)
    assert match.mean() > 0.995
    # exact distances to whatever neighbor was found (never fabricated)
    take = jax.vmap(lambda arr, idx: arr[idx])
    d_via = jnp.sum((x - take(y, i_cl)) ** 2, axis=-1)
    assert np.allclose(np.asarray(d_cl), np.asarray(d_via), rtol=1e-6, atol=1e-12)
    # found distances can never beat the true minimum
    assert (np.asarray(d_cl) >= np.asarray(d_ref) - 1e-9).all()


def test_clustered_chamfer_value_and_grad():
    x, y = _surface_clouds(n=512, m=512)
    cd_ref = chamfer_distance(x, y)
    cd_cl = chamfer_distance_clustered(x, y, 64, 12)
    assert np.allclose(np.asarray(cd_cl), np.asarray(cd_ref), rtol=2e-2)
    # chunks_per_tile (12) >= number of chunks (512/64 = 8): the pruned
    # search degenerates to an exhaustive scan, so value AND gradient must
    # match the exact kernel to float tolerance — this pins the whole
    # sorted-frame VJP (sorted-frame chamfer bwd + permutation unsort)
    assert np.allclose(np.asarray(cd_cl), np.asarray(cd_ref), rtol=1e-5)
    g_cl = jax.grad(lambda a, b: chamfer_distance_clustered(a, b, 64, 12).sum())(x, y)
    g_ref = jax.grad(lambda a, b: chamfer_distance(a, b).sum())(x, y)
    assert np.isfinite(np.asarray(g_cl)).all()
    np.testing.assert_allclose(
        np.asarray(g_cl), np.asarray(g_ref), rtol=1e-4, atol=1e-7
    )
    # gradient wrt y too (the scatter-accumulated side)
    gy_cl = jax.grad(lambda b: chamfer_distance_clustered(x, b, 64, 12).sum())(y)
    gy_ref = jax.grad(lambda b: chamfer_distance(x, b).sum())(y)
    np.testing.assert_allclose(
        np.asarray(gy_cl), np.asarray(gy_ref), rtol=1e-4, atol=1e-7
    )
