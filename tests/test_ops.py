import jax
import jax.numpy as jnp
import numpy as np
import pytest

from active_3d_vision_and_touch_tpu.core import touch_chart
from active_3d_vision_and_touch_tpu.core.camera import PinholeCamera
from active_3d_vision_and_touch_tpu.ops import (
    batch_sample,
    bilinear_sample,
    chamfer_distance,
    mesh_chamfer_distance,
    nerf_embedding,
)
from active_3d_vision_and_touch_tpu.ops.chamfer import (
    _min_dists_pallas,
    _min_dists_xla,
)


def _clouds(rng, b=2, n=300, m=450):
    x = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(b, m, 3)), jnp.float32)
    return x, y


def _brute_chamfer(x, y):
    x, y = np.asarray(x), np.asarray(y)
    d = ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)
    return d.min(2).mean(1) + d.min(1).mean(1)


def test_nerf_embedding_shape_and_values():
    pts = jnp.array([[[0.1, -0.2, 0.3]]])
    emb = nerf_embedding(pts)
    assert emb.shape == (1, 1, 63)
    # raw coords appended at the end
    assert np.allclose(emb[0, 0, -3:], [0.1, -0.2, 0.3], atol=1e-6)
    # first block is sin(pi * p)
    assert np.allclose(emb[0, 0, :3], np.sin(np.pi * np.array([0.1, -0.2, 0.3])), atol=1e-6)


def test_chamfer_matches_bruteforce(rng):
    x, y = _clouds(rng)
    cd = chamfer_distance(x, y)
    assert np.allclose(cd, _brute_chamfer(x, y), rtol=1e-4)


def test_chamfer_zero_for_identical(rng):
    x, _ = _clouds(rng)
    cd = chamfer_distance(x, x)
    assert np.allclose(cd, 0.0, atol=1e-5)


def test_chamfer_pallas_interpret_matches_xla(rng):
    x, y = _clouds(rng, b=2, n=300, m=700)
    d_ref, i_ref = _min_dists_xla(x, y)
    d_pal, i_pal = _min_dists_pallas(x, y, interpret=True)
    assert np.allclose(d_ref, d_pal, rtol=1e-4, atol=1e-5)
    # indices can differ on exact ties; distances via indices must match
    take = jax.vmap(lambda arr, idx: arr[idx])
    d_via_idx = ((x - take(y, i_pal)) ** 2).sum(-1)
    assert np.allclose(d_ref, d_via_idx, rtol=1e-4, atol=1e-5)


def test_chamfer_gradient_matches_autodiff(rng):
    x, y = _clouds(rng, b=1, n=40, m=50)

    def naive(x, y):
        d = ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)
        return (d.min(2).mean(1) + d.min(1).mean(1)).sum()

    gx_ref, gy_ref = jax.grad(naive, argnums=(0, 1))(x, y)
    gx, gy = jax.grad(lambda a, b: chamfer_distance(a, b).sum(), argnums=(0, 1))(x, y)
    assert np.allclose(gx, gx_ref, rtol=1e-4, atol=1e-6)
    assert np.allclose(gy, gy_ref, rtol=1e-4, atol=1e-6)


def test_batch_sample_on_chart(rng):
    chart = touch_chart()
    verts = jnp.asarray(chart.verts)[None].repeat(2, axis=0)
    faces = jnp.asarray(chart.faces)
    pts = batch_sample(verts, faces, jax.random.PRNGKey(0), num=2000)
    assert pts.shape == (2, 2000, 3)
    # all samples on the flat sheet: x == 0, y/z within extent
    assert np.allclose(pts[..., 2], 0.0, atol=1e-6)
    assert pts[..., :2].min() >= -0.009 - 1e-6
    assert pts[..., :2].max() <= 0.009 + 1e-6
    # area-weighted: both triangles of a quad sampled
    assert pts[..., 0].std() > 1e-3


def test_batch_sample_area_weighting():
    # two triangles, one 100x larger: samples should land ~99% on it
    verts = jnp.array(
        [[[0, 0, 0], [1, 0, 0], [0, 1, 0], [10, 10, 0], [20, 10, 0], [10, 20, 0]]],
        jnp.float32,
    )
    faces = jnp.array([[0, 1, 2], [3, 4, 5]])
    pts = batch_sample(verts, faces, jax.random.PRNGKey(1), num=4000)
    frac_big = float((pts[0, :, 0] > 5).mean())
    assert frac_big > 0.95


def test_interpolate_matches_naive_gather(rng):
    """The packed corner-table row gather and the sorted-query inverse CDF
    must be index- and value-identical to the naive formulations."""
    from active_3d_vision_and_touch_tpu.ops.sample import (
        _gather_corners,
        _interpolate,
        _inverse_cdf,
        _inverse_cdf_sorted,
    )

    b, v, f, n = 3, 40, 60, 500
    verts = jnp.asarray(rng.normal(size=(b, v, 3)).astype(np.float32))
    faces = jnp.asarray(rng.integers(0, v, size=(f, 3)).astype(np.int32))
    idx = jnp.asarray(np.sort(rng.integers(0, f, size=(b, n)), axis=1).astype(np.int32))
    w = jnp.asarray(rng.uniform(size=(b, n, 3)).astype(np.float32))

    tri = jnp.take(faces, idx, axis=0)
    naive_pts = jax.vmap(lambda vv, t: vv[t])(verts, tri)
    assert np.allclose(np.asarray(_gather_corners(verts, idx, faces)),
                       np.asarray(naive_pts))
    naive = jnp.sum(w[..., None] * naive_pts, axis=2)
    assert np.allclose(np.asarray(_interpolate(verts, idx, w, faces)),
                       np.asarray(naive), atol=1e-6)

    probs = rng.uniform(0.1, 1.0, size=(b, f)).astype(np.float32)
    cdf = jnp.asarray(np.cumsum(probs / probs.sum(1, keepdims=True), axis=1))
    u = jnp.asarray(np.sort(rng.uniform(size=(b, n)), axis=1).astype(np.float32))
    a = np.asarray(_inverse_cdf(cdf, u))
    bb = np.asarray(_inverse_cdf_sorted(cdf, u))
    assert (a == bb).all()


def test_mesh_chamfer_distance_runs(rng):
    chart = touch_chart()
    verts = jnp.asarray(chart.verts)[None]
    faces = jnp.asarray(chart.faces)
    gt = batch_sample(verts, faces, jax.random.PRNGKey(2), num=500)
    cd = mesh_chamfer_distance(verts, faces, gt, jax.random.PRNGKey(3), num=500)
    assert cd.shape == (1,)
    # same surface: CD is sampling noise only (500-point estimator)
    assert float(cd[0]) < 5e-5


def test_bilinear_sample_values():
    feat = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    # align_corners: (-1,-1) -> pixel (0,0); (1,1) -> pixel (3,3)
    grid = jnp.array([[[-1.0, -1.0], [1.0, 1.0], [0.0, 0.0]]])
    out = bilinear_sample(feat, grid)
    assert np.allclose(out[0, 0, 0], 0.0)
    assert np.allclose(out[0, 1, 0], 15.0)
    assert np.allclose(out[0, 2, 0], 7.5)  # center = mean of 5,6,9,10


def test_bilinear_sample_out_of_bounds_zero():
    feat = jnp.ones((1, 4, 4, 2))
    grid = jnp.array([[[-3.0, 0.0], [0.0, 3.0]]])
    out = bilinear_sample(feat, grid)
    assert np.allclose(out, 0.0)


@pytest.mark.parametrize("xp", ["np", "jnp"])
def test_camera_projection_center(xp):
    cam = PinholeCamera()
    mod = np if xp == "np" else jnp
    uvz = cam.project(mod.asarray([[0.0, 0.0, 0.0]]), xp=mod)
    # the origin projects to the image center
    assert np.allclose(np.asarray(uvz[0, :2]), [128.0, 128.0], atol=1e-3)
    # depth equals the camera distance
    assert np.allclose(np.asarray(uvz[0, 2]), np.sqrt(0.3**2 + 0.3**2), atol=1e-5)


def test_camera_grid_in_range():
    cam = PinholeCamera()
    # points near the origin land inside the normalized grid
    pts = np.random.default_rng(0).uniform(-0.1, 0.1, size=(1, 64, 3))
    grid = cam.normalized_grid(pts)
    assert np.abs(grid).max() < 1.0


def test_sampling_and_chamfer_deterministic(rng):
    # JAX PRNG keys make the whole loss pipeline reproducible (the
    # reference needs cuDNN determinism flags; here it's structural)
    chart = touch_chart()
    verts = jnp.asarray(chart.verts)[None]
    faces = jnp.asarray(chart.faces)
    gt = jnp.asarray(rng.normal(size=(1, 100, 3)), jnp.float32) * 0.01
    key = jax.random.PRNGKey(42)
    a = mesh_chamfer_distance(verts, faces, gt, key, num=200)
    b = mesh_chamfer_distance(verts, faces, gt, key, num=200)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    c = mesh_chamfer_distance(verts, faces, gt, jax.random.PRNGKey(43), num=200)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_chamfer_sharded_matches_single_device(rng):
    from active_3d_vision_and_touch_tpu.ops.chamfer import chamfer_distance_sharded
    from active_3d_vision_and_touch_tpu.parallel import data_parallel_mesh

    mesh = data_parallel_mesh()  # 8 virtual CPU devices
    x, y = _clouds(rng, b=2, n=256, m=512)
    ref = chamfer_distance(x, y)
    sharded = chamfer_distance_sharded(x, y, mesh)
    assert np.allclose(np.asarray(sharded), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_bilinear_sample_matches_torch_grid_sample(rng):
    torch = pytest.importorskip("torch")

    feat = rng.normal(size=(2, 7, 9, 5)).astype(np.float32)  # NHWC
    grid = rng.uniform(-1.3, 1.3, size=(2, 11, 2)).astype(np.float32)

    ours = bilinear_sample(jnp.asarray(feat), jnp.asarray(grid))

    t_feat = torch.from_numpy(feat).permute(0, 3, 1, 2)  # NCHW
    t_grid = torch.from_numpy(grid).reshape(2, 11, 1, 2)
    t_out = torch.nn.functional.grid_sample(
        t_feat, t_grid, align_corners=True, padding_mode="zeros"
    )  # (B, C, 11, 1)
    expected = t_out[:, :, :, 0].permute(0, 2, 1).numpy()
    assert np.allclose(np.asarray(ours), expected, atol=1e-5)


def test_segment_scatter_add_matches_xla(rng):
    """ops/segsum.scatter_add_3 == zeros.at[idx].add(val), incl. heavy
    duplicates, empty segments, and out-of-range drop semantics."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from active_3d_vision_and_touch_tpu.ops.segsum import scatter_add_3

    b, n, s = 3, 700, 530
    idx = np.asarray(rng.integers(0, s, (b, n)), np.int32)
    idx[0, :50] = 7  # duplicate-heavy segment
    val = np.asarray(rng.normal(size=(b, n, 3)), np.float32)
    ref = jax.vmap(lambda i, v: jnp.zeros((s, 3), jnp.float32).at[i].add(v))(
        jnp.asarray(idx), jnp.asarray(val)
    )
    out = scatter_add_3(jnp.asarray(idx), jnp.asarray(val), s)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
