import dataclasses
import os

import jax
import numpy as np
import pytest

from active_3d_vision_and_touch_tpu.active.env import ActiveTouchEnv
from active_3d_vision_and_touch_tpu.active.policies.baselines import (
    EvenSampler,
    RandomSampler,
)
from active_3d_vision_and_touch_tpu.active.replay import ReplayMemory
from active_3d_vision_and_touch_tpu.core.config import (
    AutoencoderConfig,
    PolicyConfig,
    TouchConfig,
)
from active_3d_vision_and_touch_tpu.data.generation import generate_dataset, object_dirs
from active_3d_vision_and_touch_tpu.models.autoencoder import MeshAutoEncoder
from active_3d_vision_and_touch_tpu.train.touch import TouchEngine
from active_3d_vision_and_touch_tpu.train.vision import VisionEngine

B = 2  # env batch


def small_policy_config(tmp, **kw):
    base = dict(
        use_img=False,
        use_touch=True,
        finger=False,
        num_gcn_layers=2,
        hidden_gcn_size=16,
        number_points=128,
        env_batch_size=B,
        budget=2,
        num_grasps=2,
        experiments_root=os.path.join(tmp, "exp"),
        eval=True,
    )
    base.update(kw)
    return PolicyConfig(**base)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """Tiny dataset + env with untrained frozen models."""
    tmp = str(tmp_path_factory.mktemp("active"))
    generate_dataset(tmp, num_objects=10, num_actions=4, point_dim=48, num_points=300)
    from active_3d_vision_and_touch_tpu.data.generation import make_data_split

    make_data_split(tmp, train=2, valid=2, test=2)  # ensure RL_train/test >= B
    config = small_policy_config(tmp, use_latent=True)

    touch_cfg = TouchConfig(experiments_root=os.path.join(tmp, "exp"), eval=True)
    touch_state = TouchEngine(touch_cfg, log=False).init_state(jax.random.PRNGKey(0))

    vision = VisionEngine(config, log=False)
    vision_state = vision.init_state(jax.random.PRNGKey(1))

    auto_model = MeshAutoEncoder(
        encoding_size=8, num_gcn_layers=2, hidden_gcn_size=16, grid_size=8
    )
    nv = vision.adj_info.num_verts
    auto_state = {
        "params": auto_model.init(
            jax.random.PRNGKey(2),
            np.zeros((1, nv, 3), np.float32),
            np.zeros((1, nv, 1), np.float32),
            vision.adj,
        )["params"]
    }
    env = ActiveTouchEnv(config, touch_state, vision_state, auto_state, auto_model)

    dirs = object_dirs(tmp)
    names = sorted(
        os.path.basename(f)[: -len("_verts.npy")]
        for f in os.listdir(dirs["object_info"])
        if f.endswith("_verts.npy")
    )
    rng = np.random.default_rng(0)
    batch = {
        "names": [os.path.join(dirs["object_info"], n) for n in names[:B]],
        "gt_points": np.stack(
            [
                np.load(os.path.join(dirs["point_cloud_info"], n + ".npy"))[:128]
                for n in names[:B]
            ]
        ).astype(np.float32),
    }
    return tmp, config, env, batch


def test_env_reset_step(world):
    tmp, config, env, batch = world
    obs = env.reset(batch)
    assert obs["score"].shape == (B,)
    assert obs["mask"].shape == (B, config.num_actions)
    assert obs["mask"].sum() == 0
    assert obs["mesh"].shape[0] == B and obs["mesh"].shape[2] == 4
    assert obs["latent"].shape == (B, 8)
    assert np.allclose(obs["first_score"], obs["score"])

    obs2, reward, done = env.step(np.array([3, 10]))
    assert not done
    assert obs2["mask"][0, 3] == 1 and obs2["mask"][1, 10] == 1
    assert np.isfinite(reward).all()
    # touch info was written into the step-0 slots
    assert env.current["touch_masks"][:, :, 0].max() >= 1

    obs3, reward3, done3 = env.step(np.array([5, 11]))
    assert done3  # budget = 2


def test_env_check_step_does_not_commit(world):
    tmp, config, env, batch = world
    env.reset(batch)
    mask_before = env.current["mask"].copy()
    steps_before = env.steps
    obs = env.check_step(np.array([7, 7]))
    assert env.steps == steps_before
    assert np.array_equal(env.current["mask"], mask_before)
    assert np.isfinite(obs["score"]).all()


def test_env_best_step_beats_worst(world):
    tmp, config, env, batch = world
    env.reset(batch)
    actions, obs, reward, done = env.best_step(greedy_checks=3)
    assert actions.shape == (B,)
    assert (env.current["mask"].sum(1) == 1).all()


def test_best_step_more_checks_than_unseen(world):
    """Regression: greedy probe rows must pad when fewer unseen actions
    remain than greedy_checks (previously a ValueError on row assignment)."""
    tmp, config, env, batch = world
    env.reset(batch)
    env.current["mask"][:, :-2] = 1  # only 2 actions left unseen
    unseen_before = np.nonzero(env.current["mask"][0] == 0)[0]
    actions, obs, reward, done = env.best_step(greedy_checks=5)
    assert actions.shape == (B,)
    for a in actions:
        assert int(a) in unseen_before  # padding can never win


def test_score_candidates_matches_committed_step(world):
    """Batched candidate scoring must agree (up to mesh-sampling noise)
    with the score observed after actually committing the same action, and
    must not mutate episode state."""
    tmp, config, env, batch = world
    env.reset(batch)
    mask_before = env.current["mask"].copy()
    cand = np.array([[1, 2, 3], [2, 3, 1]])
    scores = env.score_candidates(cand, chunk=2)  # chunk<k exercises padding
    assert scores.shape == (B, 3)
    assert np.isfinite(scores).all()
    assert np.array_equal(env.current["mask"], mask_before)
    assert env.steps == 0

    obs2, _, _ = env.step(np.array([1, 2]))
    rel = np.abs(scores[:, 0] - obs2["score"]) / np.abs(obs2["score"])
    assert (rel < 0.35).all(), (scores[:, 0], obs2["score"])


def test_env_single_finger_setting(world):
    """The t_p/v_t_p settings run the env with finger=True (only the
    pointer finger's chart per grasp — reference environment.py:62-104);
    reset/step/score_candidates must work with the 1-finger atlas."""
    tmp, _, _, batch = world
    config = small_policy_config(tmp, use_latent=False, finger=True)
    touch_cfg = TouchConfig(experiments_root=os.path.join(tmp, "exp"), eval=True)
    touch_state = TouchEngine(touch_cfg, log=False).init_state(jax.random.PRNGKey(0))
    vision = VisionEngine(config, log=False)
    vision_state = vision.init_state(jax.random.PRNGKey(1))
    env = ActiveTouchEnv(config, touch_state, vision_state, None, None)

    obs = env.reset(batch)
    assert np.isfinite(obs["score"]).all()
    obs2, reward, done = env.step(np.array([1, 2]))
    assert np.isfinite(reward).all()
    scores = env.score_candidates(np.array([[0, 3], [0, 3]]), chunk=2)
    assert scores.shape == (B, 2) and np.isfinite(scores).all()


def test_chart_cache_matches_live_sim(world):
    """An env backed by the dataset's precomputed chart cache must produce
    the same signals and scores as live simulation: make_touch_charts runs
    the same frozen touch model over the same deterministic grasps, so the
    gather path is signal-identical (the reference re-simulates every
    probe, environment.py:167-213)."""
    from active_3d_vision_and_touch_tpu.data.generation import make_touch_charts

    tmp, config, env, batch = world
    touch_cfg = TouchConfig(experiments_root=os.path.join(tmp, "exp"), eval=True)
    engine = TouchEngine(touch_cfg, log=False)
    touch_state = engine.init_state(jax.random.PRNGKey(0))
    make_touch_charts(tmp, engine, touch_state, batch=8, num_actions=4)

    cached_env = ActiveTouchEnv(
        config, touch_state, env.vision_state, env.auto_state, env.auto_model,
        chart_cache_root=tmp,
    )
    live_env = ActiveTouchEnv(
        config, touch_state, env.vision_state, env.auto_state, env.auto_model
    )

    obs_c = cached_env.reset(batch)
    # every (object, action<4) pair primed without touching the simulator
    assert all(
        (str(n), a) in cached_env._sig_cache
        for n in batch["names"]
        for a in range(4)
    )
    obs_l = live_env.reset(batch)
    assert np.allclose(obs_c["score"], obs_l["score"], rtol=1e-4)

    # identical PRNG streams + identical charts => identical step scores
    for action in ([1, 3], [2, 0]):
        oc, rc, _ = cached_env.step(np.array(action))
        ol, rl, _ = live_env.step(np.array(action))
        assert np.array_equal(
            cached_env.current["touch_masks"], live_env.current["touch_masks"]
        )
        assert np.allclose(
            cached_env.current["touch_charts"],
            live_env.current["touch_charts"],
            atol=1e-5,
        )
        assert np.allclose(oc["score"], ol["score"], rtol=1e-4), (
            oc["score"], ol["score"])

    # actions outside the cached range fall back to live simulation
    cached_env.reset(batch)
    scores = cached_env.score_candidates(np.array([[1, 2], [2, 1]]), chunk=2)
    assert np.isfinite(scores).all()


def test_samplers_never_repeat():
    mask = np.zeros((3, 50))
    rs = RandomSampler(50, seed=0)
    seen = [set() for _ in range(3)]
    for _ in range(5):
        acts = rs.get_action(mask)
        for i, a in enumerate(acts):
            assert a not in seen[i]
            seen[i].add(int(a))
            mask[i, a] = 1

    ev = EvenSampler(50, 5, 3, seed=0)
    plans = [list(p) for p in ev.plans]
    acts = [ev.get_action(mask) for _ in range(5)]
    acts = np.stack(acts, axis=1)
    for i in range(3):
        assert sorted(acts[i]) == sorted(plans[i])
        assert len(set(acts[i])) == 5  # evenly spaced, no repeats


def test_replay_roundtrip(tmp_path):
    mem = ReplayMemory(capacity=8, num_actions=10, batch_size=4, burn_in=2,
                       latent_size=6)
    obs = {
        "score": np.ones(3),
        "first_score": np.ones(3) * 2,
        "mask": np.zeros((3, 10)),
        "latent": np.ones((3, 6)),
        "first_latent": np.ones((3, 6)),
    }
    nxt = dict(obs, score=np.ones(3) * 0.5, mask=np.ones((3, 10)),
               latent=np.zeros((3, 6)))
    for _ in range(4):
        mem.push(np.array([1, 2, 3]), obs, nxt, np.array([0.5, 0.5, 0.5]))
    batch = mem.sample()
    assert batch is not None
    assert batch["mask"].shape == (4, 10)
    assert set(np.unique(batch["actions"])) <= {1, 2, 3}
    # ring wrap: capacity 8 < 12 pushed
    assert mem.count_seen == 12 and mem.position == 4
    mem.save(str(tmp_path))
    mem2 = ReplayMemory(capacity=8, num_actions=10, batch_size=4, burn_in=2,
                        latent_size=6)
    assert mem2.load(str(tmp_path))
    assert mem2.count_seen == 12
    assert np.array_equal(mem2.data["actions"], mem.data["actions"])


def test_replay_sample_without_replacement():
    """Regression: batches must hold distinct transitions (reference
    policies/replay.py:69-95); with-replacement draws from a small buffer
    duplicate often enough to bias updates."""
    mem = ReplayMemory(capacity=8, num_actions=10, batch_size=8, burn_in=2)
    obs = {
        "score": np.zeros(1),
        "first_score": np.zeros(1),
        "mask": np.zeros((1, 10)),
    }
    for a in range(8):
        mem.push(np.array([a]), obs, obs, np.zeros(1))
    for _ in range(10):
        batch = mem.sample()
        assert sorted(batch["actions"]) == list(range(8))


def test_supervised_poison_object_guard(world):
    """Regression: one bad object must not abort a supervised sweep
    (reference supervised/train.py:112-114)."""
    tmp, config, env, batch = world
    from active_3d_vision_and_touch_tpu.active.policies.supervised import (
        SupervisedEngine,
    )

    cfg = small_policy_config(
        tmp, use_latent=True, exp_id="sup_poison", budget=2, hidden_dim=16,
        layers=2, training_actions=2,
    )
    sup = SupervisedEngine(cfg, data_root=tmp, env=env)
    real_reset = env.reset
    calls = {"n": 0}

    def poisoned_reset(b):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("degenerate object")
        return real_reset(b)

    env.reset = poisoned_reset
    try:
        loss = sup.train_step_level(0, max_batches=2)
    finally:
        env.reset = real_reset
    assert calls["n"] >= 1  # the poison batch was hit and skipped


def test_policy_engines_smoke(world):
    tmp, config, env, batch = world
    from active_3d_vision_and_touch_tpu.active.policies.simple import (
        EvenEngine,
        GreedyEngine,
        RandomEngine,
    )

    for cls in (RandomEngine, EvenEngine):
        cfg = small_policy_config(tmp, use_latent=True, exp_id=cls.name)
        eng = cls(cfg, data_root=tmp, env=env)
        result = eng.evaluate(split="test", max_batches=1)
        assert result.scores.shape[1] == config.budget + 1
        assert np.isfinite(result.pct_cd_remaining)

    cfg = small_policy_config(tmp, use_latent=True, exp_id="greedy", greedy_checks=2)
    result = GreedyEngine(cfg, data_root=tmp, env=env).evaluate(
        split="test", max_batches=1
    )
    assert np.isfinite(result.pct_cd_remaining)


def test_mfba_leba_smoke(world):
    tmp, config, env, batch = world
    from active_3d_vision_and_touch_tpu.active.policies.dataset_specific import (
        LEBAEngine,
        MFBAEngine,
    )

    for cls in (MFBAEngine, LEBAEngine):
        cfg = small_policy_config(
            tmp, use_latent=True, exp_id=cls.name, greedy_checks=2, budget=2
        )
        eng = cls(cfg, data_root=tmp, env=env)
        seq = eng.train(train_fraction=1.0, max_batches=1)
        assert len(seq) == 2
        result = eng.evaluate(split="test", max_batches=1)
        assert np.isfinite(result.pct_cd_remaining)


def test_supervised_and_nearest_and_ddqn(world):
    tmp, config, env, batch = world
    from active_3d_vision_and_touch_tpu.active.policies.ddqn import DDQNEngine
    from active_3d_vision_and_touch_tpu.active.policies.nearest import (
        NearestNeighborEngine,
    )
    from active_3d_vision_and_touch_tpu.active.policies.supervised import (
        SupervisedEngine,
    )

    cfg = small_policy_config(
        tmp, use_latent=True, exp_id="nn", greedy_checks=2, budget=2
    )
    nn_eng = NearestNeighborEngine(cfg, data_root=tmp, env=env)
    n = nn_eng.train(train_fraction=1.0, max_batches=1)
    assert n > 0
    result = nn_eng.evaluate(split="test", max_batches=1)
    assert np.isfinite(result.pct_cd_remaining)

    cfg = small_policy_config(
        tmp, use_latent=True, exp_id="sup", budget=2, hidden_dim=16, layers=2,
        training_actions=2,
    )
    sup = SupervisedEngine(cfg, data_root=tmp, env=env)
    loss = sup.train_step_level(0, max_batches=1)
    assert np.isfinite(loss)
    result = sup.evaluate(split="test", max_batches=1)
    assert np.isfinite(result.pct_cd_remaining)

    # epochs>1 path: validation-rollout model selection per step
    # (reference supervised/train.py:63-79 scaled down)
    score = sup._validate_step(0, max_batches=1)
    assert np.isfinite(score)
    sup.train(max_batches_per_step=1, epochs=2, patience=1)
    assert len(sup.params) == cfg.budget

    # selection-rule override: argmax must pin taken actions LOW and pick
    # the complementary extreme of the same value models
    obs = {"mask": np.zeros((1, cfg.num_actions), np.float32),
           "latent": np.zeros((1, sup.model.latent_size), np.float32),
           "first_latent": np.zeros((1, sup.model.latent_size), np.float32)}
    lo = sup._select(0, obs, [])
    sup.config = dataclasses.replace(cfg, supervised_select="argmax")
    hi = sup._select(0, obs, [np.asarray(lo)])
    v = np.array(sup._apply(sup.params[0], obs["mask"], obs["latent"],
                            obs["first_latent"]))
    assert int(hi[0]) != int(lo[0])
    masked = v.copy()
    masked[0, int(lo[0])] = -1e10
    assert int(hi[0]) == int(np.argmax(masked[0]))

    cfg = small_policy_config(
        tmp, use_latent=True, exp_id="ddqn", budget=2, hidden_dim=16, layers=2,
        burn_in=2, train_batch_size=2, mem_capacity=16, pretrained_recon=False,
    )
    ddqn = DDQNEngine(cfg, data_root=tmp, env=env)
    stats = ddqn.train_epoch(max_batches=1)
    assert np.isfinite(stats["reward"])
    result = ddqn.evaluate(split="test", max_batches=1)
    assert np.isfinite(result.pct_cd_remaining)


def test_ddqn_graph_model(world):
    tmp, config, env, batch = world
    from active_3d_vision_and_touch_tpu.active.policies.ddqn import DDQNEngine

    cfg = small_policy_config(
        tmp, use_latent=False, use_recon=True, exp_id="ddqn_graph", budget=2,
        hidden_dim=16, layers=2, burn_in=2, train_batch_size=2, mem_capacity=16,
        pretrained_recon=False,
    )
    ddqn = DDQNEngine(cfg, data_root=tmp, env=env)
    stats = ddqn.train_epoch(max_batches=1)
    assert np.isfinite(stats["reward"])
    q = ddqn.q_values(env.reset(batch))
    assert q.shape == (B, cfg.num_actions)


def test_autoencoder_cluster(world, tmp_path):
    tmp, config, env, batch = world
    from active_3d_vision_and_touch_tpu.data.generation import object_dirs
    from active_3d_vision_and_touch_tpu.train.autoencoder import AutoencoderEngine
    from active_3d_vision_and_touch_tpu.train.vision import VisionEngine

    vision = VisionEngine(config, log=False)
    vstate = vision.init_state(jax.random.PRNGKey(0))
    acfg = AutoencoderConfig(
        **{k: v for k, v in config.__dict__.items() if k in AutoencoderConfig().__dict__},
    )
    acfg.encoding_size = 8
    acfg.grid_size = 8
    acfg.exp_id = "auto_cluster"
    eng = AutoencoderEngine(acfg, vision_engine=vision, vision_state=vstate, log=False)
    eng.build()

    dirs = object_dirs(tmp)
    names = sorted(
        f[: -len(".npy")] for f in os.listdir(dirs["images_colourful"])
    )[:4]
    fake_batch = {
        "gt_points": batch["gt_points"].repeat(2, axis=0)[:4],
        "touch_charts": np.zeros((4, config.num_grasps, 4, 25, 4), np.float32),
        "names": [(n, ()) for n in names],
    }
    paths = eng.cluster(
        [fake_batch], dirs["images_colourful"], str(tmp_path), examples=2, neighbors=2
    )
    assert len(paths) == 2
    assert all(os.path.exists(p) for p in paths)
