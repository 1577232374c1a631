"""Training: loss modes, optimizer schedule, convergence, checkpoints, loop."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexnerf_tpu.config import CfgNode
from dexnerf_tpu.core.encoding import encoding_dim
from dexnerf_tpu.data import build_ray_store, make_synthetic_scene
from dexnerf_tpu.models import FlexibleNeRFModel
from dexnerf_tpu.render import RenderSettings
from dexnerf_tpu.train import (
    TrainState,
    exponential_decay_schedule,
    init_train_state,
    luminance,
    make_optimizer,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
    latest_checkpoint,
)

ENC_XYZ, ENC_DIR = 4, 2
SETTINGS = RenderSettings(
    num_coarse=8,
    num_fine=8,
    perturb=True,
    radiance_field_noise_std=0.0,
    num_encoding_fn_xyz=ENC_XYZ,
    num_encoding_fn_dir=ENC_DIR,
)


def _models_and_params(seed=0, hidden=32, layers=3):
    model = FlexibleNeRFModel(
        num_layers=layers,
        hidden_size=hidden,
        num_encoding_fn_xyz=ENC_XYZ,
        num_encoding_fn_dir=ENC_DIR,
    )
    in_dim = encoding_dim(3, ENC_XYZ) + encoding_dim(3, ENC_DIR)
    key = jax.random.PRNGKey(seed)
    params = {
        "coarse": model.init(key, jnp.ones((1, in_dim))),
        "fine": model.init(jax.random.fold_in(key, 1), jnp.ones((1, in_dim))),
    }
    return model.apply, params


def test_lr_schedule_matches_reference_formula():
    sched = exponential_decay_schedule(5e-3, 250, 0.1)
    for step in [0, 1000, 250_000]:
        expected = 5e-3 * 0.1 ** (step / (250 * 1000))
        np.testing.assert_allclose(float(sched(step)), expected, rtol=1e-4)


def test_luminance_rec601():
    rgb = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [1.0, 1.0, 1.0]])
    np.testing.assert_allclose(
        np.asarray(luminance(rgb)), [0.299, 0.587, 1.0], rtol=1e-6
    )


def test_train_step_descends_loss():
    apply_fn, params = _models_and_params()
    images, _, poses, hwf = make_synthetic_scene(num_views=4, height=16, width=16)
    store = build_ray_store(images, poses, hwf, 2.0, 6.0)
    tx = make_optimizer(5e-3)
    state = init_train_state(params, tx)
    step = make_train_step(apply_fn, apply_fn, tx, SETTINGS, 128)

    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(60):
        key, sub = jax.random.split(key)
        state, metrics = step(state, store, sub)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 60
    # averaged early vs late loss must drop substantially
    early = np.mean(losses[:10])
    late = np.mean(losses[-10:])
    assert late < early * 0.7, (early, late)
    assert np.isfinite(losses).all()


def test_train_step_luminance_mode():
    apply_fn, params = _models_and_params()
    images, _, poses, hwf = make_synthetic_scene(num_views=2, height=8, width=8)
    store = build_ray_store(images, poses, hwf, 2.0, 6.0)
    tx = make_optimizer(5e-3)
    state = init_train_state(params, tx)
    step = make_train_step(
        apply_fn, apply_fn, tx, SETTINGS, 32, supervision="luminance"
    )
    state, metrics = step(state, store, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_roundtrip(tmp_path):
    apply_fn, params = _models_and_params()
    tx = make_optimizer(5e-3)
    state = init_train_state(params, tx)
    ckdir = str(tmp_path / "ck")
    save_checkpoint(ckdir, 7, state, extra={"loss": 0.5})
    path = latest_checkpoint(ckdir)
    assert path and path.endswith("checkpoint_0000007")
    restored = restore_checkpoint(path, template=state)
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored["params"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_run_training_smoke(tmp_path):
    """1-iteration end-to-end driver run on synthetic data (the tiny.yml
    smoke equivalent), incl. validation + checkpoint write."""
    from dexnerf_tpu.train import SceneData, run_training

    images, depths, poses, hwf = make_synthetic_scene(
        num_views=3, height=8, width=8
    )
    scene = SceneData(
        images=images,
        poses=poses,
        hwf=hwf,
        i_train=np.array([0, 1]),
        i_val=np.array([2]),
        depths=depths,
    )
    cfg = CfgNode(
        {
            "experiment": {
                "id": "smoke",
                "logdir": str(tmp_path),
                "randomseed": 1,
                "train_iters": 2,
                "validate_every": 1,
                "save_every": 1,
                "print_every": 1,
            },
            "dataset": {"type": "blender", "basedir": "", "near": 2.0, "far": 6.0,
                        "no_ndc": True},
            "models": {
                "coarse": {
                    "type": "FlexibleNeRFModel",
                    "num_layers": 2,
                    "hidden_size": 16,
                    "num_encoding_fn_xyz": 2,
                    "num_encoding_fn_dir": 1,
                },
                "fine": {
                    "type": "FlexibleNeRFModel",
                    "num_layers": 2,
                    "hidden_size": 16,
                    "num_encoding_fn_xyz": 2,
                    "num_encoding_fn_dir": 1,
                },
            },
            "optimizer": {"type": "Adam", "lr": 5.0e-3},
            "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
            "nerf": {
                "use_viewdirs": True,
                "train": {
                    "num_random_rays": 16,
                    "chunksize": 64,
                    "perturb": True,
                    "num_coarse": 4,
                    "num_fine": 4,
                    "white_background": False,
                    "radiance_field_noise_std": 0.0,
                    "lindisp": False,
                },
                "validation": {
                    "chunksize": 64,
                    "perturb": False,
                    "num_coarse": 4,
                    "num_fine": 4,
                    "white_background": False,
                    "radiance_field_noise_std": 0.0,
                    "lindisp": False,
                    "m_thres": 20,
                },
            },
        }
    )
    out = run_training(
        cfg, scene=scene, use_tensorboard=False, dex=True
    )
    assert "final_validation" in out
    val = out["final_validation"]
    assert np.isfinite(val["psnr"])
    # dex sweep ran: 4 thresholds (5,10,15,20)
    assert len(val["dex_errors"]) == 4
    assert "best_threshold" in val
    logdir = out["logdir"]
    assert os.path.exists(os.path.join(logdir, "config.yml"))
    assert os.path.exists(os.path.join(logdir, "metrics.jsonl"))
    assert latest_checkpoint(os.path.join(logdir, "checkpoints"))


def test_scanned_train_step_equivalent_progress():
    """steps_per_call=4 advances state.step by 4 and descends like 4 singles."""
    apply_fn, params = _models_and_params()
    images, _, poses, hwf = make_synthetic_scene(num_views=2, height=8, width=8)
    store = build_ray_store(images, poses, hwf, 2.0, 6.0)
    tx = make_optimizer(5e-3)
    state = init_train_state(params, tx)
    step4 = make_train_step(apply_fn, apply_fn, tx, SETTINGS, 32,
                            steps_per_call=4)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(10):
        key, sub = jax.random.split(key)
        state, m = step4(state, store, sub)
        losses.append(float(m["loss"]))
    assert int(state.step) == 40
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
