"""Simulator walkthrough (counterpart of the reference's
``notebook/simulator.ipynb``): generate an object, grasp it from a chosen
direction, and dump every signal the simulator produces.

Run: python examples/simulator_demo.py [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from active_3d_vision_and_touch_tpu.data import random_object
from active_3d_vision_and_touch_tpu.sim import Sampler
from active_3d_vision_and_touch_tpu.utils.viz import _save_png, visualize_depth


def main(out_dir: str = "results/simulator_demo"):
    os.makedirs(out_dir, exist_ok=True)
    obj = random_object(0)
    print(f"object: {obj.num_verts} verts / {obj.num_faces} faces")

    sampler = Sampler(bs=1, vision=True)
    sampler.load_objects([(obj.verts, obj.faces)])
    signals = sampler.sample(
        [7], touch=True, touch_point_cloud=True, vision=True, vision_occluded=True
    )

    print("touch status:", signals["touch_status"][0])
    _save_png(os.path.join(out_dir, "vision.png"), signals["vision"][0])
    _save_png(
        os.path.join(out_dir, "vision_occluded.png"), signals["vision_occluded"][0]
    )
    for f in range(4):
        _save_png(
            os.path.join(out_dir, f"touch_{f}.png"),
            signals["touch_signal"][0, f],
        )
        _save_png(
            os.path.join(out_dir, f"depth_{f}.png"),
            visualize_depth(signals["depths"][0, f]),
        )
        cloud = signals["touch_point_cloud"][0][f]
        print(f"finger {f}: {len(cloud)} touch points")
    np.save(os.path.join(out_dir, "finger_frames.npy"),
            signals["finger_transform_pos"])
    sampler.disconnect()
    print("wrote signals to", out_dir)


if __name__ == "__main__":
    main(*sys.argv[1:])
