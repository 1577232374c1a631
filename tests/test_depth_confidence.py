"""Depth-confidence maps (core.volrend.depth_confidence + eval/serve wiring).

Beyond parity: the reference ships depth maps with no reliability signal
(``volume_rendering_utils.py:45-62``); grasp planners consuming Dex-NeRF
metric depth need one to reject unreliable pixels. Confidence = the
compositing-weight mass within ±delta of the reported depth: sharp opaque
hits score ~1, diffuse/multimodal transparent-surface rays score low, and
empty rays score ~0.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from dexnerf_tpu.core import depth_confidence


def test_depth_confidence_unimodal_bimodal_empty():
    z = jnp.broadcast_to(jnp.linspace(1.0, 4.0, 16), (3, 16))
    w = np.zeros((3, 16), np.float32)
    # ray 0: sharp unimodal hit at z ~ 2
    w[0, 5] = 0.9
    w[0, 6] = 0.08
    # ray 1: bimodal (two surfaces; expected depth lands between them)
    w[1, 2] = 0.45
    w[1, 13] = 0.45
    # ray 2: empty
    w = jnp.asarray(w)
    depth = jnp.sum(w * z, axis=-1)  # the expected-depth estimator

    conf = depth_confidence(w, z, depth, 0.3)
    assert conf[0] > 0.9
    assert conf[1] < 0.1  # no mass anywhere near the averaged depth
    assert conf[2] == 0.0

    # trusting one of the bimodal MODES instead scores that mode's mass
    conf_mode = depth_confidence(w, z, z[:, 2], 0.1)
    assert abs(float(conf_mode[1]) - 0.45) < 1e-6


def test_depth_confidence_bounds_and_monotonicity():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.uniform(0, 0.1, (8, 32)).astype(np.float32))
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 32), (8, 32))
    depth = jnp.sum(w * z, axis=-1) / jnp.maximum(jnp.sum(w, -1), 1e-10)
    c_small = depth_confidence(w, z, depth, 0.05)
    c_big = depth_confidence(w, z, depth, 10.0)
    acc = jnp.sum(w, axis=-1)
    assert np.all(np.asarray(c_small) <= np.asarray(c_big) + 1e-7)
    np.testing.assert_allclose(np.asarray(c_big), np.asarray(acc), atol=1e-6)


@pytest.fixture(scope="module")
def blender_dir(tmp_path_factory):
    from dexnerf_tpu.data import write_blender_dataset

    d = str(tmp_path_factory.mktemp("data") / "blender")
    write_blender_dataset(d, height=16, width=16, views_per_split=(2, 1, 1))
    return d


def test_eval_save_depth_confidence_e2e(blender_dir, tmp_path):
    """apps.eval --save-depth-confidence: PNGs under confidence/, per-image
    depth_conf joins metrics.json with --test-set, and the occupancy
    combination is rejected."""
    import yaml

    from dexnerf_tpu.apps.eval import main as eval_main
    from dexnerf_tpu.config import load_config
    from dexnerf_tpu.train import init_train_state, make_optimizer
    from dexnerf_tpu.train.checkpoints import save_checkpoint
    from dexnerf_tpu.train.loop import setup_models

    cfg_dict = {
        "experiment": {"id": "exp", "logdir": str(tmp_path), "randomseed": 1,
                       "train_iters": 1, "validate_every": 1,
                       "save_every": 1, "print_every": 1},
        "dataset": {"type": "blender", "basedir": blender_dir,
                    "near": 2.0, "far": 6.0, "no_ndc": True},
        "models": {
            "coarse": {"type": "FlexibleNeRFModel", "num_layers": 2,
                       "hidden_size": 16, "num_encoding_fn_xyz": 2,
                       "num_encoding_fn_dir": 1},
            "fine": {"type": "FlexibleNeRFModel", "num_layers": 2,
                     "hidden_size": 16, "num_encoding_fn_xyz": 2,
                     "num_encoding_fn_dir": 1},
        },
        "optimizer": {"type": "Adam", "lr": 5.0e-3},
        "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
        "nerf": {
            "use_viewdirs": True,
            "train": {"num_random_rays": 16, "chunksize": 64,
                      "perturb": True, "num_coarse": 4, "num_fine": 4,
                      "white_background": False,
                      "radiance_field_noise_std": 0.0, "lindisp": False},
            "validation": {"chunksize": 64, "perturb": False,
                           "num_coarse": 4, "num_fine": 4,
                           "white_background": False,
                           "radiance_field_noise_std": 0.0,
                           "lindisp": False},
        },
    }
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict, f)

    cfg = load_config(cfg_path)
    _, _, params = setup_models(cfg, 1)
    state = init_train_state(params, make_optimizer(5e-3))
    ckpt_dir = str(tmp_path / "checkpoints")
    save_checkpoint(ckpt_dir, 1, state)

    savedir = str(tmp_path / "renders")
    rc = eval_main([
        "--config", cfg_path, "--checkpoint", ckpt_dir,
        "--savedir", savedir, "--test-set",
        "--save-depth-confidence", "0.5",
    ])
    assert rc == 0
    import imageio.v2 as imageio

    conf_png = imageio.imread(os.path.join(savedir, "confidence", "0000.png"))
    assert conf_png.shape == (16, 16) and conf_png.dtype == np.uint8
    with open(os.path.join(savedir, "metrics.json")) as f:
        report = json.load(f)
    assert "depth_conf" in report["per_image"][0]
    assert 0.0 <= report["per_image"][0]["depth_conf"] <= 1.0 + 1e-6
    assert "depth_conf" in report["mean"]

    with pytest.raises(SystemExit, match="pick one"):
        eval_main([
            "--config", cfg_path, "--checkpoint", ckpt_dir,
            "--savedir", savedir, "--save-depth-confidence", "0.5",
            "--occupancy", "0.5",
        ])
