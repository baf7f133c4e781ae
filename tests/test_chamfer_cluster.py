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


def test_clustered_agreement_on_v3_distribution():
    """Neighbor agreement of the pruned search on the round-3 (v3: lobed /
    multi-blob / prior-family) object distribution at the PRODUCTION kernel
    parameters (chunk 128, T=24; genuinely pruned: 24 of 64 chunks here).
    Measured CPU-interpret: 99.6-99.8% agreement, CD rel err 0.4-1.1%.
    Full-scale (30k) agreement on the real dataset is measured at campaign
    start by scripts/check_cluster_agreement.py (VERDICT r2 #10)."""
    fracs, errs = [], []
    for seed in (3, 11, 17):  # spans the v3 family mixture
        obj = random_object(seed)
        verts = jnp.asarray(obj.verts)[None]
        faces = jnp.asarray(obj.faces)
        x = batch_sample(verts, faces, jax.random.PRNGKey(seed), num=8192)
        y = batch_sample(verts, faces, jax.random.PRNGKey(seed + 100), num=8192)
        d_ref, _ = _min_dists_xla(x, y)
        d_cl, _ = min_dists_clustered(x, y, chunk_size=128, chunks_per_tile=24)
        d_ref, d_cl = np.asarray(d_ref), np.asarray(d_cl)
        assert (d_cl >= d_ref - 1e-9).all()
        fracs.append(np.isclose(d_cl, d_ref, rtol=1e-5, atol=1e-10).mean())
        errs.append(abs(d_cl.mean() - d_ref.mean()) / d_ref.mean())
    assert min(fracs) > 0.99, fracs
    assert max(errs) < 0.02, errs


def test_sharded_clustered_runs_under_mesh():
    """The clustered NN inside shard_map on the CPU test mesh: each device
    prunes within its own y-shard; pct of exact-NN agreement must stay
    high and the value must upper-bound (never beat) the exact sharded CD."""
    from active_3d_vision_and_touch_tpu.ops.chamfer import (
        chamfer_distance,
        chamfer_distance_sharded,
    )
    from active_3d_vision_and_touch_tpu.parallel import data_parallel_mesh

    mesh = data_parallel_mesh(4)
    x, y = _surface_clouds(n=512, m=1024)  # 256-point shards over 4 devices
    cd_ref = np.asarray(chamfer_distance(x, y))
    cd_sh = np.asarray(
        chamfer_distance_sharded(x, y, mesh, nn="clustered")
    )
    assert np.isfinite(cd_sh).all()
    # pruned-per-shard NN can only overestimate the min distance
    assert (cd_sh >= cd_ref - 1e-6).all()
    assert np.allclose(cd_sh, cd_ref, rtol=5e-2)


def test_tiled_gt_matches_tiled_call():
    """chamfer_clustered_tiled_gt(x, y, R) == clustered CD against
    jnp.tile(y, R) in value, and its x-gradient matches."""
    from active_3d_vision_and_touch_tpu.ops.chamfer_cluster import (
        chamfer_clustered_tiled_gt,
    )

    x, y = _surface_clouds(n=512, m=512)
    r = 3
    xr = jnp.tile(x, (r, 1, 1)) * (1.0 + 0.01 * jnp.arange(r * 2)[:, None, None])
    yt = jnp.tile(y, (r, 1, 1))
    cd_tiled = chamfer_clustered_tiled_gt(xr, y, r, 64, 12)
    cd_ref = chamfer_distance_clustered(xr, yt, 64, 12)
    np.testing.assert_allclose(
        np.asarray(cd_tiled), np.asarray(cd_ref), rtol=1e-5
    )
    g_tiled = jax.grad(lambda a: chamfer_clustered_tiled_gt(a, y, r, 64, 12).sum())(xr)
    g_ref = jax.grad(lambda a: chamfer_distance_clustered(a, yt, 64, 12).sum())(xr)
    np.testing.assert_allclose(
        np.asarray(g_tiled), np.asarray(g_ref), rtol=1e-4, atol=1e-7
    )
