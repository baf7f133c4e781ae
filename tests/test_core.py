import numpy as np

from active_3d_vision_and_touch_tpu.core import (
    action_sphere,
    build_adj_info,
    calc_adj,
    normalize_adj,
    touch_chart,
    vision_charts,
)
from active_3d_vision_and_touch_tpu.core.adjacency import _coincident_groups
from active_3d_vision_and_touch_tpu.core.mesh import TOUCH_CHART_CENTER, load_obj, save_obj


def test_touch_chart_shape():
    chart = touch_chart()
    assert chart.num_verts == 25
    assert chart.num_faces == 32
    # central vertex is the sheet center at the origin
    assert np.allclose(chart.verts[TOUCH_CHART_CENTER], 0.0)


def test_vision_charts_atlas():
    atlas = vision_charts()
    assert atlas.num_verts == 96 * 16
    assert atlas.num_faces == 96 * 18
    # all verts on the sphere
    radii = np.linalg.norm(atlas.verts, axis=1)
    assert np.allclose(radii, 0.25, atol=1e-4)
    # charts are disconnected components but share boundary positions
    groups = _coincident_groups(atlas.verts)
    assert len(groups) > 0
    # cube-sphere: a full closed surface needs duplicated boundary verts
    n_unique = len({v.tobytes() for v in atlas.verts})
    assert n_unique < atlas.num_verts


def test_calc_adj_and_normalize():
    faces = np.array([[0, 1, 2], [1, 2, 3]])
    adj = calc_adj(faces)
    assert adj.shape == (4, 4)
    assert adj[0, 0] == 1  # self loop
    assert adj[0, 1] == 1 and adj[1, 0] == 1
    assert adj[0, 3] == 0  # not connected
    norm = normalize_adj(adj)
    assert np.allclose(norm.sum(1), 1.0)


def test_build_adj_info_fused():
    atlas = vision_charts()
    info = build_adj_info(atlas, use_touch=True, num_fingers=4, num_grasps=5)
    nv = atlas.num_verts
    n_charts = 20
    assert info.adj.shape == (nv + n_charts * 25,) * 2
    assert info.original.shape == (nv, nv)
    assert info.num_charts == n_charts
    assert len(info.centers) == n_charts
    # rows normalized
    assert np.allclose(info.adj.sum(1), 1.0, atol=1e-5)
    # faces: vision + touch charts with offsets
    assert info.faces.shape[0] == atlas.num_faces + n_charts * 32
    assert info.faces.max() == nv + n_charts * 25 - 1
    # central vertices talk to coincident vision boundary verts
    c = info.centers[0]
    assert (info.adj[c] > 0).sum() > 25  # beyond its own chart


def test_build_adj_info_no_touch():
    atlas = vision_charts()
    info = build_adj_info(atlas, use_touch=False)
    assert info.adj.shape == (atlas.num_verts,) * 2
    assert info.num_charts == 0


def test_action_sphere():
    pts = action_sphere(50)
    assert pts.shape == (50, 3)
    assert np.allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-5)
    # deterministic
    assert np.array_equal(pts, action_sphere(50))


def test_obj_roundtrip(tmp_path):
    chart = touch_chart()
    path = str(tmp_path / "chart.obj")
    save_obj(path, chart.verts, chart.faces)
    loaded = load_obj(path)
    assert np.allclose(loaded.verts, chart.verts, atol=1e-5)
    assert np.array_equal(loaded.faces, chart.faces)


def test_hybrid_mesh_and_batch_sharding():
    """2-D (dcn, dp) mesh: batch splits over BOTH axes; replicate works."""
    import jax
    import jax.numpy as jnp

    from active_3d_vision_and_touch_tpu.parallel import (
        batch_sharding,
        hybrid_mesh,
        replicate,
        shard_batch,
    )

    mesh = hybrid_mesh(dcn=2, ici=4)
    assert mesh.shape == {"dcn": 2, "dp": 4}
    batch = {"x": np.arange(16 * 3, dtype=np.float32).reshape(16, 3)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding == batch_sharding(mesh, 2)
    # every device holds 16/8 = 2 rows
    shard_shapes = {s.data.shape for s in sharded["x"].addressable_shards}
    assert shard_shapes == {(2, 3)}
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])
    params = replicate({"w": jnp.ones((4, 4))}, mesh)
    assert len(params["w"].addressable_shards) == 8
