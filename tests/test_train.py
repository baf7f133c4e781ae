import jax
import numpy as np
import pytest

from active_3d_vision_and_touch_tpu.core.config import (
    AutoencoderConfig,
    TouchConfig,
    VisionConfig,
    load_config,
    save_config,
    setting_name,
)
from active_3d_vision_and_touch_tpu.parallel import data_parallel_mesh
from active_3d_vision_and_touch_tpu.train.autoencoder import AutoencoderEngine
from active_3d_vision_and_touch_tpu.train.touch import TouchEngine
from active_3d_vision_and_touch_tpu.train.vision import VisionEngine


B = 8  # divisible by the 8 virtual devices


def touch_batches(n=2, num_samples=128):
    rng = np.random.default_rng(0)
    for _ in range(n):
        yield {
            "sim_touch": rng.uniform(size=(B, 121, 121, 3)).astype(np.float32),
            "ref_pos": rng.normal(size=(B, 3)).astype(np.float32) * 0.01,
            "ref_rot": np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3)).copy(),
            "samples": rng.normal(size=(B, num_samples, 3)).astype(np.float32) * 0.01,
        }


def vision_batches(config, n=2):
    rng = np.random.default_rng(1)
    for _ in range(n):
        batch = {
            "gt_points": rng.normal(size=(B, config.number_points, 3)).astype(np.float32)
            * 0.1
        }
        if config.use_img:
            batch["img"] = rng.uniform(size=(B, 256, 256, 3)).astype(np.float32)
        if config.use_touch:
            shape = (
                (B, config.num_grasps, 25, 4)
                if config.finger
                else (B, config.num_grasps, 4, 25, 4)
            )
            batch["touch_charts"] = np.zeros(shape, np.float32)
        return_batch = batch
        yield return_batch


def test_config_roundtrip(tmp_path):
    cfg = VisionConfig(exp_id="rt", use_img=False, finger=True, num_gcn_layers=7)
    save_config(str(tmp_path), cfg)
    loaded = load_config(str(tmp_path), VisionConfig)
    assert loaded == cfg
    assert loaded.setting == "t_p"
    assert setting_name(True, False) == "v_t_g"


def test_touch_engine_smoke(tmp_path):
    cfg = TouchConfig(
        num_samples=128,
        batch_size=B,
        experiments_root=str(tmp_path),
        patience=5,
    )
    eng = TouchEngine(cfg, mesh=data_parallel_mesh(), log=False)
    eng.build()
    losses = []
    for batch in touch_batches(3):
        eng.state, loss = eng._jit_train(eng.state, batch, jax.random.PRNGKey(0))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # checkpoint roundtrip
    eng.ckpt.save(eng.state, "recent", meta={"epoch": 3, "early_stop": eng.early_stop.state()})
    eng2 = TouchEngine(cfg, mesh=data_parallel_mesh(), log=False)
    eng2.build()
    assert eng2.epoch == 3
    p1 = jax.tree_util.tree_leaves(eng.state["params"])
    p2 = jax.tree_util.tree_leaves(eng2.state["params"])
    for a, b in zip(p1, p2):
        assert np.allclose(np.asarray(a), np.asarray(b))


@pytest.fixture(scope="module")
def small_vision_cfg():
    return dict(
        number_points=128,
        num_gcn_layers=2,
        hidden_gcn_size=16,
        batch_size=B,
        patience=3,
    )


def test_vision_engine_touch_only_fit(tmp_path, small_vision_cfg):
    cfg = VisionConfig(
        use_img=False,
        use_touch=True,
        finger=False,
        experiments_root=str(tmp_path),
        **small_vision_cfg,
    )
    eng = VisionEngine(cfg, mesh=data_parallel_mesh(), log=False)
    best = eng.fit(
        lambda: vision_batches(cfg, 2), lambda: vision_batches(cfg, 1), epochs=2
    )
    assert np.isfinite(best)
    assert eng.ckpt.exists("best")


def test_vision_engine_with_image(tmp_path, small_vision_cfg):
    cfg = VisionConfig(
        use_img=True,
        use_touch=True,
        finger=True,
        experiments_root=str(tmp_path),
        **small_vision_cfg,
    )
    # smaller batch on a 2-device mesh keeps the CPU CNN tractable
    eng = VisionEngine(cfg, mesh=data_parallel_mesh(2), log=False)
    eng.build()
    batch = next(vision_batches(cfg, 1))
    batch = {k: v[:2] for k, v in batch.items()}
    state, loss = eng._jit_train(eng.state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_autoencoder_engine(tmp_path, small_vision_cfg):
    vcfg = VisionConfig(
        use_img=False,
        use_touch=True,
        experiments_root=str(tmp_path),
        **small_vision_cfg,
    )
    vision = VisionEngine(vcfg, mesh=data_parallel_mesh(), log=False)
    vstate = vision.init_state(jax.random.PRNGKey(0))
    acfg = AutoencoderConfig(
        use_img=False,
        use_touch=True,
        encoding_size=16,
        grid_size=8,
        experiments_root=str(tmp_path),
        exp_id="auto",
        **small_vision_cfg,
    )
    eng = AutoencoderEngine(
        acfg, vision_engine=vision, vision_state=vstate, mesh=data_parallel_mesh(), log=False
    )
    eng.build()
    batch = next(vision_batches(vcfg, 1))
    state, loss = eng._jit_train(eng.state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # latent extraction path
    verts, mask = eng._deform(batch)
    latent = eng.encode(state, verts, mask)
    assert latent.shape == (B, 16)


def test_vision_evaluate_detailed(tmp_path, small_vision_cfg):
    cfg = VisionConfig(
        use_img=False,
        use_touch=True,
        finger=False,
        experiments_root=str(tmp_path),
        exp_id="detailed",
        **small_vision_cfg,
    )
    eng = VisionEngine(cfg, mesh=data_parallel_mesh(), log=False)
    eng.build()

    def loader():
        batch = next(vision_batches(cfg, 1))
        batch["names"] = [(f"obj{i}", ()) for i in range(B)]
        yield batch

    mean_cd, per_object = eng.evaluate_detailed(
        loader(), visualize_dir=str(tmp_path / "viz"), max_visualize=2
    )
    assert np.isfinite(mean_cd)
    assert len(per_object) == B
    import os
    assert os.path.exists(tmp_path / "viz" / "obj0" / "prediction.png")


def test_early_stop_patience():
    from active_3d_vision_and_touch_tpu.train.common import EarlyStop

    es = EarlyStop(patience=2)
    assert es.update(1.0)  # improvement
    assert not es.update(2.0)
    assert not es.should_stop
    assert not es.update(3.0)
    assert es.should_stop
    # state roundtrip
    es2 = EarlyStop(patience=2)
    es2.restore(es.state())
    assert es2.best == 1.0 and es2.should_stop
    # equal value counts as improvement (reference uses >=)
    es3 = EarlyStop(patience=1)
    es3.update(5.0)
    assert es3.update(5.0)


def test_async_checkpoint_roundtrip(tmp_path):
    import numpy as np

    from active_3d_vision_and_touch_tpu.train.common import CheckpointManager

    state = {"w": np.arange(6, dtype=np.float32).reshape(2, 3), "step": 7}
    mgr = CheckpointManager(str(tmp_path), async_save=True)
    mgr.save(state, "recent", meta={"epoch": 1})
    mgr.wait_until_finished()
    template = {"w": np.zeros((2, 3), np.float32), "step": 0}
    # a fresh (sync) manager restores what the async one wrote
    out = CheckpointManager(str(tmp_path)).restore(template, "recent")
    np.testing.assert_array_equal(out["w"], state["w"])
    assert out["step"] == 7
    # restore on the async manager fences in-flight saves itself
    mgr.save(state, "best")
    out2 = mgr.restore(template, "best")
    assert out2["step"] == 7
