"""End-to-end miniature run of the whole framework (counterpart of the
reference's Reconstruction + Policies notebooks, shrunk to minutes):

1. generate a small procedural dataset,
2. train the touch-chart model briefly,
3. cache predicted touch charts,
4. train the vision deformation model briefly (touch-only setting),
5. evaluate random vs even vs greedy policies on the test split.

Run: python examples/full_pipeline_demo.py [root]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main(root: str = "results/pipeline_demo"):
    from active_3d_vision_and_touch_tpu.active.env import ActiveTouchEnv
    from active_3d_vision_and_touch_tpu.active.policies.simple import (
        EvenEngine,
        GreedyEngine,
        RandomEngine,
    )
    from active_3d_vision_and_touch_tpu.core.config import PolicyConfig, TouchConfig, VisionConfig
    from active_3d_vision_and_touch_tpu.data.datasets import Loader, TouchDataset, VisionDataset
    from active_3d_vision_and_touch_tpu.data.generation import (
        generate_dataset,
        make_data_split,
        make_touch_charts,
    )
    from active_3d_vision_and_touch_tpu.train.touch import TouchEngine
    from active_3d_vision_and_touch_tpu.train.vision import VisionEngine

    exp = os.path.join(root, "exp")

    # 1. data
    print("== generating dataset ==")
    generate_dataset(root, num_objects=12, num_actions=8, point_dim=64, num_points=2000)
    make_data_split(root, train=2, valid=2, test=2)

    # 2. touch model
    print("== training touch model ==")
    tcfg = TouchConfig(
        num_samples=256, batch_size=2, epochs=2, experiments_root=exp, exp_type="touch"
    )
    touch = TouchEngine(tcfg, log=False)
    tds = TouchDataset(root, split="recon_train", num_samples=256)
    make = lambda: Loader(tds, batch_size=2, shuffle=True)  # noqa: E731
    touch.fit(make, make, epochs=2)

    # 3. chart cache
    print("== caching touch charts ==")
    make_touch_charts(root, touch, touch.state, num_actions=8)

    # 4. vision model (touch-only for speed)
    print("== training vision model ==")
    vcfg = VisionConfig(
        use_img=False, use_touch=True, number_points=512, num_gcn_layers=3,
        hidden_gcn_size=32, batch_size=2, num_actions=8, num_grasps=2,
        experiments_root=exp, exp_type="vision",
    )
    vision = VisionEngine(vcfg, log=False)
    vds = VisionDataset(
        root, split="recon_train", use_img=False, use_touch=True,
        num_grasps=2, number_points=512, num_actions=8,
    )
    vmake = lambda: Loader(vds, batch_size=2, shuffle=True)  # noqa: E731
    vision.fit(vmake, vmake, epochs=2)

    # 5. policies
    print("== evaluating policies ==")
    pcfg = PolicyConfig(
        use_img=False, use_touch=True, number_points=512, num_gcn_layers=3,
        hidden_gcn_size=32, env_batch_size=2, budget=2, num_grasps=2,
        greedy_checks=4, experiments_root=exp, eval=True,
    )
    env = ActiveTouchEnv(pcfg, touch.state, vision.state)
    for cls in (RandomEngine, EvenEngine, GreedyEngine):
        cfg = PolicyConfig(**{**pcfg.__dict__, "exp_id": cls.name})
        result = cls(cfg, data_root=root, env=env).evaluate("test", max_batches=1)
        print(f"{cls.name:>8}: {result.pct_cd_remaining:.1f}% CD remaining")


if __name__ == "__main__":
    main(*sys.argv[1:])
