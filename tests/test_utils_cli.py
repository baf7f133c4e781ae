import os

import numpy as np

from active_3d_vision_and_touch_tpu.core import touch_chart, vision_charts
from active_3d_vision_and_touch_tpu.sim.tacto import TactoRenderer
from active_3d_vision_and_touch_tpu.utils.profiler import StepTimer, trace
from active_3d_vision_and_touch_tpu.utils.viz import (
    debug_projection_overlay,
    render_mesh_image,
    render_points_image,
    visualize_actions,
    visualize_depth,
    visualize_prediction,
)


def test_visualize_actions(tmp_path):
    visualize_actions(str(tmp_path), np.array([0, 1, 1, 7, 49]), num_actions=50)
    assert os.path.exists(tmp_path / "histogram.png")
    assert os.path.exists(tmp_path / "sphere_projection.png")


def test_visualize_actions_camera_mask(tmp_path):
    from active_3d_vision_and_touch_tpu.utils.viz import camera_visible_actions

    vis = camera_visible_actions(50)
    # roughly half the sphere faces the camera, never all or none
    assert 10 < vis.sum() < 40
    visualize_actions(
        str(tmp_path), np.array([0, 1]), num_actions=50, use_img=True
    )
    assert os.path.exists(tmp_path / "sphere_projection.png")


def test_visualize_depth():
    d = np.array([[0.01, 0.03], [0.0, 0.025]])
    out = visualize_depth(d, max_depth=0.025)
    assert out.dtype == np.uint8
    assert out[0, 1] == 0  # beyond range zeroed


def test_render_mesh_and_points():
    atlas = vision_charts()
    img = render_mesh_image(atlas.verts, atlas.faces)
    assert img.shape == (256, 256, 3)
    assert (img < 250).any()
    pts_img = render_points_image(atlas.verts)
    assert (pts_img != 255).any()


def test_visualize_prediction(tmp_path):
    chart = touch_chart()
    dirs = visualize_prediction(
        str(tmp_path),
        chart.verts[None] * 10,
        chart.faces,
        ["objects/000001"],
        gt_points=chart.verts[None] * 10,
    )
    assert os.path.exists(os.path.join(dirs[0], "prediction.png"))
    assert os.path.exists(os.path.join(dirs[0], "ground_truth_points.png"))


def test_debug_projection_overlay(tmp_path):
    """Projected vertices must land on the rendered object's silhouette —
    the renderer and the pooling share core/camera.py, so the red overlay
    pixels should hit non-background pixels of the render."""
    atlas = vision_charts()
    img = render_mesh_image(atlas.verts, atlas.faces)
    out_path = str(tmp_path / "overlay.png")
    overlay = debug_projection_overlay(img, atlas.verts, out_path)
    assert os.path.exists(out_path)
    red = np.all(overlay == (255, 0, 0), axis=-1)
    assert red.any()
    # the verts project inside the object: at overlay-red positions the
    # original render must mostly be foreground (not the white background)
    fg = ~np.all(img >= 250, axis=-1)
    assert (fg[red].mean()) > 0.9


def test_tacto_renderer():
    r = TactoRenderer(resolution=61, max_depth=0.015, seed=0)
    depth = np.zeros((61, 61))
    depth[20:40, 20:40] = 0.005  # indentation
    img = r.render(depth)
    assert img.shape == (61, 61, 3)
    assert img.min() >= 0 and img.max() <= 255
    flat = r.render(np.zeros((61, 61)))
    # indentation changes the image vs flat gel
    assert np.abs(img[25:35, 25:35] - flat[25:35, 25:35]).mean() > 1.0


def test_tacto_calibration_pipeline():
    """Reference _calibrate semantics: an empty frame reproduces the
    background exactly (diff = 0), and a supplied real background is what
    contacts composite over."""
    r = TactoRenderer(resolution=61, max_depth=0.015, seed=0)
    empty = r.render(np.zeros((61, 61)), noise=False)
    assert np.abs(empty - r._background_real).max() < 1e-3

    real_bg = np.full((61, 61, 3), 42.0, np.float32)
    r2 = TactoRenderer(resolution=61, max_depth=0.015, seed=0,
                       background_real=real_bg)
    empty2 = r2.render(np.zeros((61, 61)), noise=False)
    assert np.abs(empty2 - 42.0).max() < 1e-3  # composites over the photo
    d = np.zeros((61, 61))
    d[25:35, 25:35] = 0.004
    touched = r2.render(d, noise=False)
    assert np.abs(touched - empty2).max() > 5.0


def test_profiler_noop_and_timer():
    with trace("unit"):  # disabled: no env var
        pass
    timer = StepTimer(warmup=1)
    for _ in range(3):
        with timer:
            sum(range(1000))
    stats = timer.stats()
    assert stats["steps"] == 2
    assert stats["steps_per_sec"] > 0


def test_cli_parsers():
    from active_3d_vision_and_touch_tpu import cli

    # parse-only: verify the arg surface exists for every subcommand
    parser_probe = [
        ["generate-data", "--root", "x", "--objects", "3"],
        ["train-touch", "--root", "x", "--eval"],
        ["train-vision", "--root", "x", "--setting", "t_g", "--eval"],
        ["make-touch-charts", "--root", "x", "--touch-location", "y"],
        ["train-auto", "--root", "x", "--eval"],
        ["policy", "even", "--root", "x", "--eval"],
    ]
    import argparse

    for argv in parser_probe:
        try:
            cli.main(argv + ["--help"])
        except SystemExit as e:
            assert e.code == 0


def test_cli_generate_data(tmp_path, capsys):
    from active_3d_vision_and_touch_tpu import cli

    rc = cli.main(
        ["generate-data", "--root", str(tmp_path), "--objects", "2", "--actions", "2"]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    import json

    splits = json.loads(out)
    assert sum(splits.values()) <= 2 and splits["recon_train"] >= 1
    assert (tmp_path / "data_split.npy").exists()
    assert (tmp_path / "grasp_info").is_dir()
