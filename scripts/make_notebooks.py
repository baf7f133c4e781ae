"""Generate the notebook/ walkthroughs (the reference ships 9 .ipynb files
under notebook/{simulator,Reconstruction,Policies}; README.md:120-147).

Each notebook is runnable against the in-repo mini dataset + checkpoints
(data_mini, results_mini) on CPU — cells keep sizes small.  Regenerate with
`python scripts/make_notebooks.py`.
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SETUP = """\
import os, sys
sys.path.insert(0, os.path.abspath('../..') if os.path.basename(os.getcwd()) in ('Reconstruction', 'Policies', 'Baselines', 'dataset_specific') else os.path.abspath('..'))
while not os.path.exists('data_mini'):
    os.chdir('..')
import numpy as np
import matplotlib.pyplot as plt
import jax
jax.config.update('jax_platforms', 'cpu')  # notebooks run fine on CPU"""


def nb(cells):
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python", "version": "3.12"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def md(text):
    return {"cell_type": "markdown", "metadata": {}, "source": text.splitlines(True)}


def code(text):
    return {"cell_type": "code", "execution_count": None, "metadata": {},
            "outputs": [], "source": text.splitlines(True)}


NOTEBOOKS = {}

NOTEBOOKS["notebook/simulator.ipynb"] = nb([
    md("# Simulator walkthrough\n\n"
       "Grasping an object with the four-finger hand and reading the optical "
       "touch sensors (the TPU-native equivalent of the reference's "
       "`notebook/simulator.ipynb`: pybullet/pyrender replaced by the in-repo "
       "C++ rasterizer + procedural hand)."),
    code(SETUP),
    code("""\
from active_3d_vision_and_touch_tpu.core.config import SimConfig
from active_3d_vision_and_touch_tpu.sim.sampler import Sampler
from active_3d_vision_and_touch_tpu.data.generation import object_dirs

dirs = object_dirs('data_mini')
names = sorted(f[:-len('_verts.npy')] for f in os.listdir(dirs['object_info'])
               if f.endswith('_verts.npy'))[:2]
sampler = Sampler(bs=2, vision=True, config=SimConfig())
sampler.load_objects([os.path.join(dirs['object_info'], n) for n in names])
signals = sampler.sample([3, 17], touch=True, vision=True, vision_occluded=True)
print('statuses:', signals['touch_status'])"""),
    code("""\
fig, axes = plt.subplots(2, 5, figsize=(16, 6))
for row in range(2):
    axes[row, 0].imshow(signals['vision_occluded'][row]); axes[row, 0].set_title('scene (occluded)')
    for f in range(4):
        axes[row, f + 1].imshow(signals['touch_signal'][row, f] / 255.0)
        axes[row, f + 1].set_title(f"finger {f}: {signals['touch_status'][row][f]}")
[a.axis('off') for a in axes.ravel()]; plt.tight_layout()"""),
    code("""\
# the DIGIT/TACTO-style colored gel renderer (SimConfig(tacto=True))
tacto = Sampler(bs=1, vision=False, config=SimConfig(tacto=True))
tacto.load_objects([os.path.join(dirs['object_info'], names[0])])
tsig = tacto.sample([3], touch=True)
plt.figure(figsize=(8, 2.5))
for f in range(4):
    plt.subplot(1, 4, f + 1); plt.imshow(tsig['touch_signal'][0, f] / 255.0)
    plt.axis('off'); plt.title(tsig['touch_status'][0][f])"""),
])

NOTEBOOKS["notebook/Reconstruction/touch_chart_prediction.ipynb"] = nb([
    md("# Touch-chart prediction\n\n"
       "The touch CNN maps a gel image + sensor frame to a 25-vertex local "
       "surface chart (reference `notebook/Reconstruction/touch_chart_prediction.ipynb`)."),
    code(SETUP),
    code("""\
from active_3d_vision_and_touch_tpu.core.config import TouchConfig
from active_3d_vision_and_touch_tpu.train.common import CheckpointManager
from active_3d_vision_and_touch_tpu.train.touch import TouchEngine
from active_3d_vision_and_touch_tpu.data.datasets import TouchDataset, Loader

tcfg = TouchConfig(experiments_root='results_mini/exp', exp_type='touch',
                   exp_id='mini', eval=True)
touch = TouchEngine(tcfg, log=False)
state = CheckpointManager(tcfg.checkpoint_dir).restore(
    touch.init_state(jax.random.PRNGKey(0)), 'best')
ds = TouchDataset('data_mini', 'valid', num_samples=500)
batch = next(iter(Loader(ds, 8, shuffle=False)))
print({k: np.shape(v) for k, v in batch.items() if k != 'names'})"""),
    code("""\
pred = np.asarray(touch.predict(state, batch['sim_touch'], batch['ref_pos'], batch['ref_rot']))
i = 0
fig = plt.figure(figsize=(10, 4))
ax = fig.add_subplot(1, 2, 1); ax.imshow(batch['sim_touch'][i]); ax.set_title('gel image'); ax.axis('off')
ax = fig.add_subplot(1, 2, 2, projection='3d')
gt = batch['samples'][i]
ax.scatter(gt[:, 0], gt[:, 1], gt[:, 2], s=2, label='touch point cloud')
ax.scatter(pred[i][:, 0], pred[i][:, 1], pred[i][:, 2], s=25, label='predicted chart')
ax.legend()"""),
])

NOTEBOOKS["notebook/Reconstruction/object_prediction.ipynb"] = nb([
    md("# Object reconstruction\n\n"
       "The deformation GCN reconstructs the full surface from touch charts "
       "(setting t_g) — reference `notebook/Reconstruction/object_prediction.ipynb`."),
    code(SETUP),
    code("""\
from active_3d_vision_and_touch_tpu.core.config import VisionConfig
from active_3d_vision_and_touch_tpu.train.common import CheckpointManager
from active_3d_vision_and_touch_tpu.train.vision import VisionEngine
from active_3d_vision_and_touch_tpu.data.datasets import VisionDataset, Loader

vcfg = VisionConfig(use_img=False, use_touch=True, finger=False,
                    number_points=2000, experiments_root='results_mini/exp',
                    exp_type='vision', exp_id='mini_t_g', eval=True)
vision = VisionEngine(vcfg, log=False)
vision.build()
restored = CheckpointManager(vcfg.checkpoint_dir).restore(vision.state, 'best')
if restored is not None:
    vision.state = restored
ds = VisionDataset('data_mini', split='valid', use_img=False, use_touch=True,
                   num_grasps=5, number_points=2000)
batch = next(iter(Loader(ds, 4, shuffle=False)))
arrays = {k: v for k, v in batch.items() if k != 'names'}
verts, mask, _ = vision.apply(vision.state, arrays, train=False)
print('predicted vertices:', verts.shape)"""),
    code("""\
from active_3d_vision_and_touch_tpu.utils.viz import render_mesh_image, render_points_image
i = 0
plt.figure(figsize=(9, 4))
plt.subplot(1, 2, 1); plt.imshow(render_mesh_image(np.asarray(verts[i]), np.asarray(vision.faces)))
plt.title('reconstruction'); plt.axis('off')
plt.subplot(1, 2, 2); plt.imshow(render_points_image(batch['gt_points'][i]))
plt.title('ground-truth points'); plt.axis('off')"""),
])

NOTEBOOKS["notebook/Reconstruction/autoencoder.ipynb"] = nb([
    md("# Mesh autoencoder\n\n"
       "Encodes reconstructions into a 200-d latent (used by the learned "
       "policies) and decodes a point cloud back — reference "
       "`notebook/Reconstruction/autoencoder.ipynb`."),
    code(SETUP),
    code("""\
from active_3d_vision_and_touch_tpu.core.config import AutoencoderConfig, VisionConfig
from active_3d_vision_and_touch_tpu.models.autoencoder import MeshAutoEncoder
from active_3d_vision_and_touch_tpu.train.common import CheckpointManager
from active_3d_vision_and_touch_tpu.train.vision import VisionEngine
from active_3d_vision_and_touch_tpu.core.config import load_config

acfg_dir = 'results_mini/exp/checkpoint/auto/mini_t_g'
acfg = load_config(acfg_dir, AutoencoderConfig)
auto = MeshAutoEncoder(encoding_size=acfg.encoding_size,
                       num_gcn_layers=acfg.num_gcn_layers,
                       hidden_gcn_size=acfg.hidden_gcn_size,
                       cut=acfg.cut, grid_size=acfg.grid_size)
raw = CheckpointManager(acfg_dir).restore_raw('best')
vision = VisionEngine(VisionConfig(use_img=False, use_touch=True, eval=True), log=False)
nv = vision.adj_info.num_verts
latent = auto.apply({'params': raw['params']},
                    np.zeros((1, nv, 3), np.float32),
                    np.zeros((1, nv, 1), np.float32),
                    vision.adj, only_encode=True)
print('latent:', latent.shape)"""),
    code("""\
# decode: latent -> FoldingNet point cloud
decoded, latent2 = auto.apply({'params': raw['params']},
                              np.zeros((1, nv, 3), np.float32),
                              np.zeros((1, nv, 1), np.float32),
                              vision.adj)
print('decoded cloud:', np.asarray(decoded).shape, 'latent:', np.asarray(latent2).shape)"""),
])


def policy_nb(title, name, train_snippet=""):
    train_cell = [code(train_snippet)] if train_snippet else []
    return nb([
        md(f"# {title} policy\n\n"
           f"Reference `notebook/Policies/.../{title}.ipynb` equivalent: "
           "evaluate % Chamfer distance remaining after a 5-grasp budget."),
        code(SETUP),
        code(f"""\
from active_3d_vision_and_touch_tpu.core.config import PolicyConfig
from active_3d_vision_and_touch_tpu.active.policies import (
    simple, nearest, supervised, ddqn, dataset_specific)
engines = {{'random': simple.RandomEngine, 'even': simple.EvenEngine,
           'greedy': simple.GreedyEngine,
           'nearest_neighbor': nearest.NearestNeighborEngine,
           'supervised': supervised.SupervisedEngine, 'ddqn': ddqn.DDQNEngine,
           'mfba': dataset_specific.MFBAEngine,
           'leba': dataset_specific.LEBAEngine}}
name = {name!r}
cfg = PolicyConfig(
    use_img=False, use_touch=True, finger=False, number_points=2000,
    env_batch_size=2, budget=5, num_grasps=5, greedy_checks=5,
    use_latent=name in ('nearest_neighbor', 'supervised', 'ddqn'),
    hidden_dim=64, layers=2, burn_in=2, train_batch_size=2, mem_capacity=32,
    experiments_root='/tmp/nb_exp', eval=True, exp_id=f'nb_{{name}}',
    touch_location='results_mini/exp/checkpoint/touch/mini',
    vision_location='results_mini/exp/checkpoint/vision/mini_t_g',
    auto_location='results_mini/exp/checkpoint/auto/mini_t_g')
engine = engines[name](cfg, data_root='data_mini')"""),
        *train_cell,
        code("""\
result = engine.evaluate('test', max_batches=1)
print(result.summary())
plt.plot(result.scores.T); plt.xlabel('grasps'); plt.ylabel('CD score')
plt.title('per-episode score trajectories')"""),
    ])


NOTEBOOKS["notebook/Policies/Baselines/Random.ipynb"] = policy_nb("Random", "random")
NOTEBOOKS["notebook/Policies/Baselines/Even.ipynb"] = policy_nb("Even", "even")
NOTEBOOKS["notebook/Policies/Baselines/Greedy.ipynb"] = policy_nb("Greedy", "greedy")
NOTEBOOKS["notebook/Policies/NearestNeighbor.ipynb"] = policy_nb(
    "NearestNeighbor", "nearest_neighbor",
    "engine.train(train_fraction=1.0, max_batches=1)")
NOTEBOOKS["notebook/Policies/supervised.ipynb"] = policy_nb(
    "Supervised", "supervised",
    "loss = engine.train_step_level(0, max_batches=1)\nprint('step-0 value loss:', loss)")
NOTEBOOKS["notebook/Policies/DDQN.ipynb"] = policy_nb(
    "DDQN", "ddqn",
    "stats = engine.train_epoch(max_batches=1)\nprint(stats)")
NOTEBOOKS["notebook/Policies/dataset_specific/MFBA.ipynb"] = policy_nb(
    "MFBA", "mfba",
    "engine.train(train_fraction=1.0, max_batches=1)\n"
    "print('learned sequence:', engine.chosen_actions)")
NOTEBOOKS["notebook/Policies/dataset_specific/LEBA.ipynb"] = policy_nb(
    "LEBA", "leba",
    "engine.train(train_fraction=1.0, max_batches=1)\n"
    "print('learned sequence:', engine.chosen_actions)")


def main():
    for path, content in NOTEBOOKS.items():
        full = os.path.join(ROOT, path)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        with open(full, "w") as f:
            json.dump(content, f, indent=1)
        print("wrote", path)


if __name__ == "__main__":
    main()
