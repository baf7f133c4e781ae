"""Headline benchmark: full-size vision+touch training-step throughput.

Measures jit'd end-to-end train steps/sec of the flagship Deformation model
(v_t_g: image encoder pyramids x2, 3-stage 20-layer GCN over the fused
chart atlas, 30k-point 3-repeat Chamfer loss via the Pallas NN kernel,
optax adam update) at the reference's training batch size 16 on one chip.

The reference publishes no throughput numbers (BASELINE.md); the
``vs_baseline`` denominator is the documented estimate of the PyTorch/V100
reference at the same workload: ~1.0 steps/s (dominated by the 3x-repeated
30k x 30k PyTorch3D brute-force Chamfer fwd+bwd plus 60 dense 2324^2 GCN
matmuls).  Treat it as an anchor, not a measurement.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

V100_BASELINE_STEPS_PER_SEC = 1.0

def main():
    from active_3d_vision_and_touch_tpu.core.config import VisionConfig
    from active_3d_vision_and_touch_tpu.parallel import (
        data_parallel_mesh,
        shard_batch,
    )
    from active_3d_vision_and_touch_tpu.train.vision import VisionEngine

    config = VisionConfig(
        use_img=True,
        use_touch=True,
        finger=False,
        batch_size=16,
        number_points=30000,
        eval=True,
    )
    mesh = data_parallel_mesh()
    engine = VisionEngine(config, mesh=mesh, log=False)
    engine.build()

    rng = np.random.default_rng(0)
    b = config.batch_size
    batch = {
        "img": rng.uniform(size=(b, 256, 256, 3)).astype(np.float32),
        "gt_points": rng.normal(size=(b, config.number_points, 3)).astype(np.float32)
        * 0.1,
        "touch_charts": rng.normal(size=(b, config.num_grasps, 4, 25, 4)).astype(
            np.float32
        )
        * 0.1,
    }
    batch = shard_batch(batch, mesh)

    key = jax.random.PRNGKey(0)
    # warmup / compile
    state, loss = engine._jit_train(engine.state, batch, key)
    jax.block_until_ready(loss)

    steps = 20
    t0 = time.perf_counter()
    for i in range(steps):
        state, loss = engine._jit_train(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    steps_per_sec = steps / dt
    print(
        json.dumps(
            {
                "metric": "vision_touch_train_steps_per_sec_bs16",
                "value": round(steps_per_sec, 4),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / V100_BASELINE_STEPS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
