"""External-OBJ ingestion (reference ABC-download path, data_making.py:76-95).

Verifies the README claim that any OBJ collection drops into the same
preprocessing: tiny OBJs written from scratch go through
``generate_dataset(from_obj_dir=...)`` end-to-end — normalization, point
clouds, grasp simulation, splits — and the result loads through the same
dataset classes as procedural data.
"""

import os

import numpy as np
import pytest

from active_3d_vision_and_touch_tpu.core.mesh import load_obj, save_obj
from active_3d_vision_and_touch_tpu.data.generation import (
    generate_dataset,
    ingest_obj_dir,
    object_dirs,
)
from active_3d_vision_and_touch_tpu.data.primitives import lobed_blob, multi_blob


@pytest.fixture(scope="module")
def obj_collection(tmp_path_factory):
    """Three tiny OBJs at deliberately unnormalized scales/offsets."""
    src = tmp_path_factory.mktemp("objs")
    rng = np.random.default_rng(3)
    for i, mesh in enumerate(
        [lobed_blob(rng, subdivisions=2), multi_blob(rng),
         lobed_blob(rng, subdivisions=2)]
    ):
        verts = mesh.verts * (5.0 + i) + np.float32([10.0, -3.0, i])
        save_obj(str(src / f"part_{chr(99 - i)}.obj"), verts, mesh.faces)
    return str(src)


def test_ingest_normalizes_and_keeps_provenance(tmp_path, obj_collection):
    root = str(tmp_path / "data")
    names = ingest_obj_dir(root, obj_collection)
    assert names == ["000000", "000001", "000002"]
    dirs = object_dirs(root)
    for name in names:
        verts = np.load(os.path.join(dirs["object_info"], name + "_verts.npy"))
        # reference preprocessing: centered, max extent 1/scale (scale=3.1)
        assert np.allclose((verts.max(0) + verts.min(0)) / 2, 0, atol=1e-5)
        assert (verts.max(0) - verts.min(0)).max() == pytest.approx(1 / 3.1, rel=1e-4)
        src = open(os.path.join(dirs["object_info"], name + "_source.txt")).read()
        assert src.strip().endswith(".obj")
    # sorted source order: part_a.obj -> 000000 etc.
    first = open(os.path.join(dirs["object_info"], "000000_source.txt")).read()
    assert first.strip() == "part_a.obj"
    # the saved OBJ round-trips through our reader
    mesh = load_obj(os.path.join(dirs["object_info"], "000000.obj"))
    assert np.allclose(
        mesh.verts,
        np.load(os.path.join(dirs["object_info"], "000000_verts.npy")),
        atol=1e-5,
    )


def test_ingest_empty_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        ingest_obj_dir(str(tmp_path / "data"), str(tmp_path))


def test_generate_dataset_from_obj_dir_end_to_end(tmp_path, obj_collection):
    root = str(tmp_path / "data")
    splits = generate_dataset(
        root, num_objects=0, num_actions=3, point_dim=48, num_points=300,
        from_obj_dir=obj_collection,
    )
    dirs = object_dirs(root)
    # _verts/_faces/.obj/_source per object
    assert len(os.listdir(dirs["object_info"])) == 3 * 4
    assert len(os.listdir(dirs["point_cloud_info"])) == 3
    assert len(os.listdir(dirs["grasp_info"])) == 3
    assert sum(len(v) for v in splits.values()) == 3
    some_obj = sorted(os.listdir(dirs["grasp_info"]))[0]
    assert len(os.listdir(os.path.join(dirs["grasp_info"], some_obj))) == 3
