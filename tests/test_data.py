import os

import numpy as np
import pytest

from active_3d_vision_and_touch_tpu.data.datasets import (
    ActiveDataset,
    Loader,
    TouchDataset,
    VisionDataset,
    load_split,
)
from active_3d_vision_and_touch_tpu.data.generation import (
    generate_dataset,
    make_touch_charts,
    object_dirs,
)


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    """Tiny end-to-end generated dataset: 6 objects, 6 actions."""
    root = str(tmp_path_factory.mktemp("dataset"))
    splits = generate_dataset(
        root, num_objects=6, num_actions=6, point_dim=48, num_points=600
    )
    return root, splits


def test_generated_layout(dataset_root):
    root, splits = dataset_root
    dirs = object_dirs(root)
    assert len(os.listdir(dirs["object_info"])) == 6 * 3
    assert len(os.listdir(dirs["point_cloud_info"])) == 6
    assert len(os.listdir(dirs["images_colourful"])) == 6
    assert len(os.listdir(dirs["grasp_info"])) == 6
    assert set(splits) == {"recon_train", "auto_train", "RL_train", "valid", "test"}
    assert load_split(root).keys() == splits.keys()
    # grasp dumps: every action dir exists with ref frames for valid grasps
    some_obj = sorted(os.listdir(dirs["grasp_info"]))[0]
    actions = os.listdir(os.path.join(dirs["grasp_info"], some_obj))
    assert len(actions) == 6


def test_touch_dataset_and_loader(dataset_root):
    root, splits = dataset_root
    split = next(s for s in splits if splits[s] and _has_touch(root, splits[s]))
    ds = TouchDataset(root, split=split, num_samples=256)
    assert len(ds) > 0
    item = ds[0]
    assert item["sim_touch"].shape == (121, 121, 3)
    assert item["sim_touch"].max() <= 1.0
    assert item["samples"].shape == (256, 3)
    assert item["ref_rot"].shape == (3, 3)
    batch = next(iter(Loader(ds, batch_size=min(2, len(ds)), shuffle=True)))
    assert batch["sim_touch"].ndim == 4


def _has_touch(root, names):
    from glob import glob

    dirs = object_dirs(root)
    return any(
        glob(os.path.join(dirs["grasp_info"], n, "*", "*_touch.npy")) for n in names
    )


def test_touch_charts_and_vision_dataset(dataset_root):
    root, splits = dataset_root

    # produce the touch-chart cache with an untrained touch model
    from active_3d_vision_and_touch_tpu.core.config import TouchConfig
    from active_3d_vision_and_touch_tpu.train.touch import TouchEngine
    import jax

    cfg = TouchConfig(experiments_root=os.path.join(root, "exp"), eval=True)
    engine = TouchEngine(cfg, log=False)
    state = engine.init_state(jax.random.PRNGKey(0))
    make_touch_charts(root, engine, state, num_actions=6)

    dirs = object_dirs(root)
    charts_files = os.listdir(dirs["touch_charts"])
    assert len(charts_files) == 6
    charts = np.load(
        os.path.join(dirs["touch_charts"], charts_files[0], "touch_charts.npy")
    )
    assert charts.shape == (6, 4, 25, 4)  # num_actions=6 in this fixture
    assert set(np.unique(charts[..., 3])) <= {0.0, 1.0, 2.0}

    split = next(s for s in splits if splits[s])
    ds = VisionDataset(
        root,
        split=split,
        num_grasps=2,
        number_points=128,
        num_actions=6,
        use_img=True,
        use_touch=True,
    )
    if len(ds):
        item = ds[0]
        assert item["gt_points"].shape == (128, 3)
        assert item["img"].shape == (256, 256, 3)
        assert item["touch_charts"].shape == (2, 4, 25, 4)

    # single-finger (t_p/v_t_p) variant slices the canonical finger:
    # charts drop the finger axis (reference --finger, vision/train.py:218)
    ds_p = VisionDataset(
        root, split=split, num_grasps=2, number_points=128, num_actions=6,
        use_img=False, use_touch=True, finger=True,
    )
    if len(ds_p):
        item = ds_p[0]
        assert item["touch_charts"].shape == (2, 25, 4)


def test_active_dataset(dataset_root):
    root, splits = dataset_root
    split = next(s for s in splits if splits[s])
    ds = ActiveDataset(root, split=split, number_points=128, env_batch_size=1)
    if len(ds):
        item = ds[0]
        assert item["gt_points"].shape == (128, 3)
        assert "names" in item


def test_vision_dataset_validation_deterministic(dataset_root):
    root, splits = dataset_root
    split = next(s for s in ("valid", "test") if splits[s])
    kw = dict(
        split=split, num_grasps=2, number_points=64, num_actions=6,
        use_img=False, use_touch=False,
    )
    a = VisionDataset(root, **kw)
    b = VisionDataset(root, **kw)
    if len(a):
        ia, ib = a[0], b[0]
        assert ia["names"] == ib["names"]  # same seeded grasp draw
        assert np.array_equal(ia["gt_points"], ib["gt_points"])


def test_loader_process_shard(dataset_root):
    """Multi-host data sharding: same seeded order, disjoint strided
    slices, union covers the dataset."""
    root, splits = dataset_root
    ds = TouchDataset(root, "recon_train", num_samples=100)
    seen = []
    for pidx in range(2):
        ld = Loader(ds, batch_size=1, shuffle=True, seed=3, drop_last=False,
                    process_shard=(pidx, 2))
        names = [b["names"][0] for b in ld]
        assert len(names) == len(ld)
        seen.append({tuple(map(str, n)) for n in names})
    assert not (seen[0] & seen[1])
    assert len(seen[0] | seen[1]) == len(ds)


def test_data_split_stable_under_growth(tmp_path):
    """Growing a dataset must never move an existing object between splits
    (the per-name hash bucket contract: results tables stay extendable and
    pilot training can never leak later test objects)."""
    import numpy as np
    from active_3d_vision_and_touch_tpu.data.generation import (
        make_data_split, object_dirs,
    )

    root = str(tmp_path)
    info = object_dirs(root)["object_info"]
    os.makedirs(info)

    def add(lo, hi):
        for i in range(lo, hi):
            np.save(os.path.join(info, f"{i:06d}_verts.npy"), np.zeros((3, 3)))

    add(0, 120)
    before = make_data_split(root)
    assign_before = {n: k for k, v in before.items() for n in v}
    add(120, 200)
    after = make_data_split(root)
    assign_after = {n: k for k, v in after.items() for n in v}
    assert len(assign_after) == 200
    for n, k in assign_before.items():
        assert assign_after[n] == k  # no object changed split
    # every split really grew or stayed (proportional buckets)
    assert all(len(after[k]) >= len(before[k]) for k in before)
