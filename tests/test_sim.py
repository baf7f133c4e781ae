import numpy as np
import pytest

from active_3d_vision_and_touch_tpu.core.actions import action_sphere
from active_3d_vision_and_touch_tpu.data import random_object
from active_3d_vision_and_touch_tpu.data.generation import extract_surface_points
from active_3d_vision_and_touch_tpu.sim import Hand, Sampler, Scene
from active_3d_vision_and_touch_tpu.sim.collision import solid_occupancy
from active_3d_vision_and_touch_tpu.sim.hand import FINGERTIP_REACH
from active_3d_vision_and_touch_tpu.sim import raster


@pytest.fixture(scope="module")
def obj():
    return random_object(0)


def test_random_objects_are_valid():
    for seed in range(4):
        m = random_object(seed)
        assert m.num_verts > 100
        extent = m.verts.max(0) - m.verts.min(0)
        assert np.isclose(extent.max(), 1 / 3.1, atol=1e-3)
        center = (m.verts.max(0) + m.verts.min(0)) / 2
        assert np.allclose(center, 0, atol=1e-3)
        assert m.faces.max() < m.num_verts


def test_rasterizer_numpy_native_parity(obj):
    rot = np.array([[0, 1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    f = raster.focal_from_yfov(40.0, 64)
    args = (obj.verts, obj.faces, np.array([-0.4, 0, 0]), rot, f, 64, 64)
    d1, i1 = raster.rasterize_depth(*args, use_native=False)
    if raster.native_available():
        d2, i2 = raster.rasterize_depth(*args, use_native=True)
        both = (i1 >= 0) & (i2 >= 0)
        assert both.sum() > 100
        # same coverage up to edge-fill convention, same depths where hit
        assert ((i1 >= 0) != (i2 >= 0)).mean() < 0.01
        assert np.allclose(d1[both], d2[both], atol=1e-4)


def test_hand_fk_rest_pose():
    hand = Hand()
    hand.set_base(np.zeros(3), np.eye(3))
    tip_pos, tip_rot = hand.finger_frames(1)[-1]
    assert np.allclose(tip_pos, [0, 0, FINGERTIP_REACH], atol=1e-9)
    # curling bends the fingertip toward +x (the palm normal)
    hand.joint_angles[3:6] = 0.5
    tip_pos2, _ = hand.finger_frames(1)[-1]
    assert tip_pos2[0] > 0.02
    assert tip_pos2[2] < FINGERTIP_REACH


def test_solid_occupancy(obj):
    grid = solid_occupancy(obj.verts, obj.faces, resolution=64)
    assert grid.contains(np.zeros((1, 3)))[0]  # center inside
    assert not grid.contains(np.array([[1.0, 1.0, 1.0]]))[0]


def test_grasp_places_fingertip_on_hull(obj):
    scene = Scene(vision=False)
    scene.load_obj(obj.verts, obj.faces)
    ok = scene.grasp(7)
    assert ok
    # the canonical fingertip should be within a few cm of the object
    tip_pos, _ = scene.hand.finger_frames(1)[-1]
    d = np.linalg.norm(obj.verts - tip_pos, axis=1).min()
    assert d < 0.05
    # the hand's -x axis aligns with the outward hull normal, which points
    # roughly along the approach ray direction
    direction = -action_sphere(50)[7]
    hand_minus_x = -scene.hand.base_rot[:, 0]
    assert np.dot(direction, hand_minus_x) > 0.3


def test_scene_touch_pipeline(obj):
    scene = Scene(vision=False)
    scene.load_obj(obj.verts, obj.faces)
    assert scene.grasp(0)
    statuses = scene.render_depth()
    assert len(statuses) == 4
    assert "touch" in statuses  # at least one finger senses the object
    touch = scene.render_touch()
    assert touch.shape == (4, 121, 121, 3)
    assert touch.max() <= 255 and touch.min() >= 0
    clouds = scene.depth_to_points()
    for status, cloud in zip(statuses, clouds):
        if status == "touch":
            assert len(cloud) > 0
            # touch points lie near the object SURFACE — measure against a
            # densified sampling, not the raw vertices: eccentric stretched
            # generators have large triangles whose vertex spacing alone
            # exceeds the sensor scale
            from active_3d_vision_and_touch_tpu.sim.collision import (
                subdivide_to_density,
            )

            surf = subdivide_to_density(
                obj.verts.astype(np.float64), obj.faces, 0.01
            ).astype(np.float32)
            d = np.linalg.norm(surf[None] - cloud[:50, None], axis=-1).min(1)
            assert d.mean() < 0.03


def test_sampler_batched_contract(obj):
    other = random_object(1)
    s = Sampler(bs=2, vision=True)
    s.load_objects([(obj.verts, obj.faces), (other.verts, other.faces)])
    # pick an action whose approach direction faces the scene camera so the
    # hand is visible in the occluded view
    cam_dir = np.array([-0.3, 0, 0.3]) / np.linalg.norm([-0.3, 0, 0.3])
    facing = int(np.argmax((-action_sphere(50)) @ cam_dir))
    out = s.sample([facing, 13], touch=True, touch_point_cloud=True, vision=True,
                   vision_occluded=True)
    assert out["touch_signal"].shape == (2, 4, 121, 121, 3)
    assert out["depths"].shape == (2, 4, 121, 121)
    assert out["finger_transform_pos"].shape == (2, 4, 3)
    assert out["finger_transform_rot_M"].shape == (2, 4, 3, 3)
    assert len(out["touch_status"]) == 2
    assert len(out["touch_point_cloud"]) == 2
    assert out["vision"][0].shape == (256, 256, 3)
    assert out["vision_occluded"][0].shape == (256, 256, 3)
    # occluded view shows the hand: more non-background pixels
    fg = lambda im: (im < 250).any(-1).sum()  # noqa: E731
    assert fg(out["vision_occluded"][0]) > fg(out["vision"][0])
    # rotation matrices are orthonormal
    r = out["finger_transform_rot_M"][0, 0]
    assert np.allclose(r @ r.T, np.eye(3), atol=1e-5)
    s.disconnect()


def test_extract_surface_points(obj):
    pts = extract_surface_points(obj.verts, obj.faces, dim=64, num_points=2000)
    assert pts.shape == (2000, 3)
    # points hug the SURFACE (densified — raw vertex spacing on stretched
    # generators exceeds the carve cell size)
    from active_3d_vision_and_touch_tpu.sim.collision import subdivide_to_density

    surf = subdivide_to_density(
        obj.verts.astype(np.float64), obj.faces, 0.01
    ).astype(np.float32)
    d = np.linalg.norm(pts[:, None] - surf[None], axis=-1).min(1)
    assert np.quantile(d, 0.9) < 0.025  # 64^3 carve: ~2 voxel cells
    # aligned extents
    assert np.allclose(pts.max(0), obj.verts.max(0), atol=0.02)
    assert np.allclose(pts.min(0), obj.verts.min(0), atol=0.02)


def test_urdf_export_roundtrip(tmp_path, obj):
    from active_3d_vision_and_touch_tpu.core.mesh import save_obj
    from active_3d_vision_and_touch_tpu.sim.urdf import (
        export_hand_urdf,
        export_object_urdf,
        load_urdf_mesh_paths,
    )

    obj_path = str(tmp_path / "obj.obj")
    save_obj(obj_path, obj.verts, obj.faces)
    urdf = export_object_urdf(obj_path)
    assert load_urdf_mesh_paths(urdf) == [obj_path] * 2  # visual + collision

    hand = Hand()
    hand_urdf = export_hand_urdf(hand, str(tmp_path / "hand"))
    paths = load_urdf_mesh_paths(hand_urdf)
    assert len(paths) == 2 * 13  # palm + 12 links, visual+collision each
