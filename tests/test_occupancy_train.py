"""Occupancy-guided TRAINING (beyond parity; render/occupancy.py).

The render-side occupancy feature (tests/test_occupancy.py) tightens
eval-time intervals from a finished checkpoint; here the TRAIN loop bakes
the grid from the in-progress field and re-tightens the ray store's
per-ray ``intervals`` periodically, so the fixed per-ray sample budget
concentrates where matter is. Covers: the per-ray interval plumbing
through the store gather (identity at full intervals), the bulk store
tightening (conservative, actually shrinks, misses keep full intervals),
the run_training e2e (+ metrics), the parallel path, and the guards.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexnerf_tpu.data import (
    build_ray_store,
    make_synthetic_scene,
    sample_ray_batch,
    with_full_intervals,
)
from dexnerf_tpu.render import build_occupancy_grid
from dexnerf_tpu.render.occupancy import tighten_store_intervals

SPHERE_R = 0.5


def sphere_field(params, pts, viewdirs):
    del params, viewdirs
    r = jnp.linalg.norm(pts, axis=-1)
    sigma = jnp.where(r < SPHERE_R, 50.0, -10.0)
    rgb = jnp.full((*pts.shape[:-1], 3), 4.0, pts.dtype)
    return jnp.concatenate([rgb, sigma[..., None]], axis=-1)


def _store(num_views=3, hw=8):
    images, _, poses, hwf = make_synthetic_scene(
        num_views=num_views, height=hw, width=hw
    )
    return build_ray_store(images, poses, hwf, 2.0, 6.0)


def test_full_intervals_is_gather_identity():
    """A store with explicit full-scalar intervals yields bit-identical
    batches to the plain store — installing intervals before the first
    bake cannot perturb the trajectory."""
    store = _store()
    store_iv = with_full_intervals(store)
    assert store_iv.intervals.shape == (store.num_rays, 2)
    key = jax.random.PRNGKey(3)
    rays_a, tgt_a = sample_ray_batch(store, key, 32)
    rays_b, tgt_b = sample_ray_batch(store_iv, key, 32)
    np.testing.assert_array_equal(np.asarray(tgt_a), np.asarray(tgt_b))
    for field in ("origins", "directions", "viewdirs", "near", "far"):
        np.testing.assert_array_equal(
            np.asarray(getattr(rays_a, field)),
            np.asarray(getattr(rays_b, field)),
        )
    # idempotent
    assert with_full_intervals(store_iv) is store_iv


def test_take_ray_batch_uses_tightened_intervals():
    store = _store()
    iv = np.tile(
        np.asarray([[2.5, 4.5]], np.float32), (store.num_rays, 1)
    )
    import dataclasses

    store_t = dataclasses.replace(store, intervals=jnp.asarray(iv))
    rays, _ = sample_ray_batch(store_t, jax.random.PRNGKey(0), 16)
    np.testing.assert_allclose(np.asarray(rays.near), 2.5)
    np.testing.assert_allclose(np.asarray(rays.far), 4.5)


def test_tighten_store_conservative_and_shrinks():
    """Bulk tightening over a packed store: hit rays bracket the sphere
    chord inside the original bounds; miss rays keep the full interval;
    the mean interval shrinks. Also exercises the block padding path
    (N not a multiple of the block)."""
    grid = build_occupancy_grid(
        sphere_field,
        None,
        sigma_threshold=1.0,
        center=(0.0, 0.0, 0.0),
        radius=1.0,
        resolution=32,
        dilate=1,
        batch=4096,
    )
    # 7 hit rays straight through the center + 5 clean misses
    n_hit, n_miss = 7, 5
    ro = np.concatenate(
        [
            np.tile(np.asarray([[0.0, 0.0, -2.0]], np.float32), (n_hit, 1)),
            np.tile(np.asarray([[0.0, 5.0, -2.0]], np.float32), (n_miss, 1)),
        ]
    )
    rd = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (n_hit + n_miss, 1))
    rows = np.concatenate(
        [ro, rd, rd, np.zeros((n_hit + n_miss, 3), np.float32)], axis=-1
    )
    near, far = 0.5, 3.5
    iv = np.asarray(
        tighten_store_intervals(
            grid, jnp.asarray(rows), near, far, num_probes=128, block=8
        )
    )
    assert iv.shape == (n_hit + n_miss, 2)
    # conservative: always inside the original bounds
    assert (iv[:, 0] >= near - 1e-6).all() and (iv[:, 1] <= far + 1e-6).all()
    # hit rays: chord [1.5, 2.5] bracketed, and actually tightened
    assert (iv[:n_hit, 0] <= 1.5 + 1e-5).all()
    assert (iv[:n_hit, 1] >= 2.5 - 1e-5).all()
    assert (iv[:n_hit, 1] - iv[:n_hit, 0] < 1.5).all()
    # misses: untouched full interval
    np.testing.assert_allclose(iv[n_hit:, 0], near)
    np.testing.assert_allclose(iv[n_hit:, 1], far)


def _occ_cfg(tmp_path, **train_extra):
    from dexnerf_tpu.config import CfgNode

    return CfgNode({
        "experiment": {
            "id": "occtrain", "logdir": str(tmp_path), "randomseed": 1,
            "train_iters": 6, "validate_every": 0, "save_every": 0,
            "print_every": 1,
        },
        "dataset": {"type": "blender", "basedir": "", "near": 2.0,
                    "far": 6.0, "no_ndc": True},
        "models": {
            "coarse": {
                "type": "FlexibleNeRFModel", "num_layers": 2,
                "hidden_size": 16, "num_encoding_fn_xyz": 2,
                "num_encoding_fn_dir": 1,
            },
            "fine": {
                "type": "FlexibleNeRFModel", "num_layers": 2,
                "hidden_size": 16, "num_encoding_fn_xyz": 2,
                "num_encoding_fn_dir": 1,
            },
        },
        "optimizer": {"type": "Adam", "lr": 5.0e-3},
        "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
        "nerf": {
            "use_viewdirs": True,
            "train": {
                "num_random_rays": 16, "chunksize": 64, "perturb": True,
                "num_coarse": 4, "num_fine": 4, "white_background": False,
                "radiance_field_noise_std": 0.0, "lindisp": False,
                "occupancy_start_iter": 2,
                "occupancy_rebake_every": 2,
                "occupancy_resolution": 16,
                "occupancy_probes": 16,
                "occupancy_radius": 1.5,
                **train_extra,
            },
            "validation": {
                "chunksize": 64, "perturb": False, "num_coarse": 4,
                "num_fine": 4, "white_background": False,
                "radiance_field_noise_std": 0.0, "lindisp": False,
            },
        },
    })


def _scene(num_views=3, hw=8):
    from dexnerf_tpu.train import SceneData

    images, depths, poses, hwf = make_synthetic_scene(
        num_views=num_views, height=hw, width=hw
    )
    return SceneData(
        images=images, poses=poses, hwf=hwf,
        i_train=np.array([0, 1]), i_val=np.array([2]),
    )


def test_run_training_occupancy_e2e(tmp_path):
    from dexnerf_tpu.train import run_training

    out = run_training(
        _occ_cfg(tmp_path), scene=_scene(), use_tensorboard=False,
        occupancy=0.5,
    )
    assert np.isfinite(out["final_train_metrics"]["loss"])
    # the bake ran and reported store-level observability
    assert "occ_fraction" in out and 0.0 <= out["occ_fraction"] <= 1.0
    assert "occ_interval_shrink" in out
    assert 0.0 <= out["occ_interval_shrink"] < 1.0
    metrics_log = os.path.join(out["logdir"], "metrics.jsonl")
    with open(metrics_log) as f:
        tags = {json.loads(line)["tag"] for line in f}
    assert "train/occ_fraction" in tags
    assert "train/occ_interval_shrink" in tags


def test_run_training_occupancy_parallel(tmp_path):
    """Per-ray intervals replicate through the shard_map store like the
    packed rows do (8 virtual CPU devices)."""
    from dexnerf_tpu.train import run_training

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    out = run_training(
        _occ_cfg(tmp_path), scene=_scene(), use_tensorboard=False,
        occupancy=0.5, num_devices=8,
    )
    assert np.isfinite(out["final_train_metrics"]["loss"])
    assert "occ_fraction" in out


def test_occupancy_guards(tmp_path):
    from dexnerf_tpu.train import run_training

    scene = _scene()
    scene.use_ndc = True
    with pytest.raises(ValueError, match="NDC"):
        run_training(
            _occ_cfg(tmp_path), scene=scene, use_tensorboard=False,
            occupancy=0.5,
        )
    with pytest.raises(ValueError, match="pose"):
        run_training(
            _occ_cfg(tmp_path), scene=_scene(), use_tensorboard=False,
            occupancy=0.5, pose_opt=True,
        )
