"""Host-streaming ray store (data/host_store.py): host-RAM rows, background
prefetch, and the explicit-batch train step — the beyond-HBM data path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexnerf_tpu.core.encoding import encoding_dim
from dexnerf_tpu.data import (
    HostRayLoader,
    build_host_ray_rows,
    build_ray_store,
    make_synthetic_scene,
)
from dexnerf_tpu.models import FlexibleNeRFModel
from dexnerf_tpu.render import RenderSettings
from dexnerf_tpu.train import init_train_state, make_optimizer
from dexnerf_tpu.train.step import make_batch_train_step, make_train_step

ENC_XYZ, ENC_DIR = 2, 1
SETTINGS = RenderSettings(
    num_coarse=4,
    num_fine=4,
    perturb=True,
    num_encoding_fn_xyz=ENC_XYZ,
    num_encoding_fn_dir=ENC_DIR,
)


def _scene(num_views=2, hw=8):
    images, depths, poses, hwf = make_synthetic_scene(
        num_views=num_views, height=hw, width=hw
    )
    return images, depths, poses, hwf


def _setup_model():
    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=16,
        num_encoding_fn_xyz=ENC_XYZ, num_encoding_fn_dir=ENC_DIR,
    )
    in_dim = encoding_dim(3, ENC_XYZ) + encoding_dim(3, ENC_DIR)
    key = jax.random.PRNGKey(0)
    params = {
        "coarse": model.init(key, jnp.ones((1, in_dim))),
        "fine": model.init(jax.random.fold_in(key, 1), jnp.ones((1, in_dim))),
    }
    return model.apply, params


def test_host_rows_match_device_store():
    """The incrementally-built host rows are bit-identical to the resident
    store's packed rows (same ray math, one image at a time)."""
    images, depths, poses, hwf = _scene()
    store = build_ray_store(images, poses, hwf, 2.0, 6.0, depths=depths)
    rows, depth = build_host_ray_rows(images, poses, hwf, depths=depths)
    np.testing.assert_array_equal(rows, np.asarray(store.data))
    np.testing.assert_array_equal(depth, np.asarray(store.depth))


def test_loader_reproducible_and_prefetches():
    images, _, poses, hwf = _scene()
    rows, _ = build_host_ray_rows(images, poses, hwf)

    def collect(seed, k=3):
        out = []
        with HostRayLoader(rows, 2.0, 6.0, 16, seed) as loader:
            for _ in range(k):
                rays, target = next(loader)
                out.append(np.asarray(target))
        return out

    a = collect(7)
    b = collect(7)
    c = collect(8)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)  # same seed -> same stream
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))
    # batches carry consistent geometry: viewdirs are unit-norm rows
    with HostRayLoader(rows, 2.0, 6.0, 16, 0) as loader:
        rays, target = next(loader)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(rays.viewdirs), axis=-1), 1.0,
            atol=1e-5,
        )
        assert float(rays.near[0]) == 2.0 and float(rays.far[0]) == 6.0


def test_batch_step_matches_resident_step_on_same_batch():
    """Feeding the batch step the exact rows the resident step would have
    sampled reproduces its loss bit-for-bit (same key split structure)."""
    from dexnerf_tpu.data import sample_ray_batch

    apply_fn, params = _setup_model()
    images, _, poses, hwf = _scene()
    store = build_ray_store(images, poses, hwf, 2.0, 6.0)
    tx = make_optimizer(5e-3)

    rstep = make_train_step(apply_fn, apply_fn, tx, SETTINGS, 16)
    bstep = make_batch_train_step(apply_fn, apply_fn, tx, SETTINGS)

    key = jax.random.PRNGKey(3)
    # what the resident step samples internally with this key
    k_sample, _ = jax.random.split(key)
    rays, target = sample_ray_batch(store, k_sample, 16)

    sa = init_train_state(params, tx)
    sb = init_train_state(jax.tree.map(jnp.copy, params), tx)
    sa, ma = rstep(sa, store, key)
    sb, mb = bstep(sb, rays, target, key)
    # identical forward computation: the loss agrees BITWISE
    assert float(ma["loss"]) == float(mb["loss"])
    assert float(ma["psnr"]) == float(mb["psnr"])
    # post-Adam params: the two programs fuse differently, and Adam's
    # step-1 update g/(|g|+eps) is ill-conditioned for near-zero grads, so
    # last-ulp grad differences can move an update by ~1e-6 — bound by a
    # small fraction of the 5e-3 learning rate rather than by ulps
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=0, atol=1e-5),
        sa.params, sb.params,
    )


def test_run_training_host_store_e2e(tmp_path):
    """cfg.dataset.host_store: true trains end-to-end (loader + batch step
    wired through run_training), loss descends, checkpoints land."""
    import os

    from dexnerf_tpu.config import CfgNode
    from dexnerf_tpu.data import write_blender_dataset
    from dexnerf_tpu.train import run_training

    base = str(tmp_path / "blender")
    write_blender_dataset(base, height=10, width=10, views_per_split=(2, 1, 1))
    cfg = CfgNode(
        {
            "experiment": {
                "id": "host-e2e",
                "logdir": str(tmp_path / "logs"),
                "randomseed": 1,
                "train_iters": 6,
                "validate_every": 0,
                "save_every": 6,
                "print_every": 2,
            },
            "dataset": {
                "type": "blender",
                "basedir": base,
                "near": 2.0,
                "far": 6.0,
                "no_ndc": True,
                "host_store": True,
            },
            "models": {
                "coarse": {
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
                    "num_random_rays": 32,
                    "chunksize": 256,
                    "perturb": True,
                    "num_coarse": 4,
                    "num_fine": 0,
                    "white_background": False,
                    "radiance_field_noise_std": 0.0,
                    "lindisp": False,
                },
                "validation": {
                    "chunksize": 256,
                    "perturb": False,
                    "num_coarse": 4,
                    "num_fine": 0,
                    "white_background": False,
                    "radiance_field_noise_std": 0.0,
                    "lindisp": False,
                },
            },
        }
    )
    out = run_training(cfg)
    assert np.isfinite(out["final_train_metrics"]["loss"])
    ckpts = os.listdir(str(tmp_path / "logs" / "host-e2e" / "checkpoints"))
    assert any(c.startswith("checkpoint_") for c in ckpts)


def test_host_store_rejects_parallel_and_per_image(tmp_path):
    from dexnerf_tpu.config import CfgNode
    from dexnerf_tpu.data import write_blender_dataset
    from dexnerf_tpu.train import run_training

    base = str(tmp_path / "blender")
    write_blender_dataset(base, height=8, width=8, views_per_split=(2, 1, 1))

    def cfg(**dataset_extra):
        return CfgNode(
            {
                "experiment": {
                    "id": "x", "logdir": str(tmp_path / "logs"),
                    "randomseed": 1, "train_iters": 1,
                    "validate_every": 0, "save_every": 0, "print_every": 1,
                },
                "dataset": {
                    "type": "blender", "basedir": base, "near": 2.0,
                    "far": 6.0, "no_ndc": True, "host_store": True,
                    **dataset_extra,
                },
                "models": {
                    "coarse": {
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
                        "num_random_rays": 16, "chunksize": 64,
                        "perturb": True, "num_coarse": 4, "num_fine": 0,
                        "white_background": False,
                        "radiance_field_noise_std": 0.0, "lindisp": False,
                    },
                    "validation": {
                        "chunksize": 64, "perturb": False, "num_coarse": 4,
                        "num_fine": 0, "white_background": False,
                        "radiance_field_noise_std": 0.0, "lindisp": False,
                    },
                },
            }
        )

    with pytest.raises(ValueError, match="single-device"):
        run_training(cfg(), num_devices=8)
    with pytest.raises(ValueError, match="uniform sampling"):
        run_training(cfg(), sampling="per_image")


def test_packed_wire_matches_row_wire():
    """The packed wire (u32 idx + u8 rgb, rays reconstructed in-step from
    the pose table) must reproduce the row wire's rays/targets: same-seed
    loaders draw the same index stream, and the device-side ray math is
    the same formula as build_host_ray_rows' — for all three conventions
    (c2w, w2c+K, c2w+NDC)."""
    import jax.numpy as jnp

    from dexnerf_tpu.data.host_store import (
        HostPixelLoader,
        HostRayLoader,
        build_host_ray_rows,
        build_pose_tables,
        images_to_u8,
        make_ray_unpack,
    )

    rng = np.random.default_rng(0)
    H = W = 6
    n_img = 3
    # u8-sourced pixels: the packed wire is lossless for real datasets
    images = (
        rng.integers(0, 256, (n_img, H, W, 3)).astype(np.float32) / 255.0
    )
    # orthonormal-ish c2w poses
    poses = np.tile(np.eye(4, dtype=np.float32), (n_img, 1, 1))
    for i in range(n_img):
        q, _ = np.linalg.qr(np.eye(3) + 0.1 * rng.standard_normal((3, 3)))
        poses[i, :3, :3] = q
        poses[i, :3, 3] = rng.uniform(-1, 1, 3)
    hwf = [H, W, 8.0]
    K = np.array([[8.0, 0, 3.0], [0, 8.0, 2.5], [0, 0, 1]], np.float32)
    Ks = np.tile(K, (n_img, 1, 1))
    depths = rng.uniform(2.0, 6.0, (n_img, H, W)).astype(np.float32)

    for convention in ("c2w", "w2c", "ndc"):
        kw = {}
        if convention == "w2c":
            kw["intrinsics"] = Ks
        if convention == "ndc":
            kw["use_ndc"] = True
        rows, depth_flat = build_host_ray_rows(
            images, poses, hwf, depths=depths, **kw
        )
        tables = build_pose_tables(poses, hwf, **kw)
        unpack = make_ray_unpack(tables, 2.0, 6.0)

        with HostRayLoader(rows, 2.0, 6.0, 64, seed=7,
                           depth=depth_flat) as rl, \
                HostPixelLoader(images_to_u8(images), 64, seed=7,
                                depth=depths.reshape(-1)) as pl:
            row_rays, row_target, row_depth = next(rl)
            packed = next(pl)
        got_rays, got_target, got_depth = unpack(packed)

        np.testing.assert_allclose(
            np.asarray(got_rays.origins), np.asarray(row_rays.origins),
            atol=1e-5, err_msg=convention,
        )
        np.testing.assert_allclose(
            np.asarray(got_rays.directions),
            np.asarray(row_rays.directions), atol=1e-5, err_msg=convention,
        )
        np.testing.assert_allclose(
            np.asarray(got_rays.viewdirs), np.asarray(row_rays.viewdirs),
            atol=1e-5, err_msg=convention,
        )
        np.testing.assert_allclose(
            np.asarray(got_rays.near), np.asarray(row_rays.near)
        )
        # u8 round-trip of u8-sourced pixels is exact
        np.testing.assert_allclose(
            np.asarray(got_target), np.asarray(row_target), atol=1e-7,
            err_msg=convention,
        )
        np.testing.assert_array_equal(
            np.asarray(got_depth), np.asarray(row_depth)
        )


def test_run_training_host_wire_packed_vs_rows(tmp_path):
    """Both wire formats train end-to-end through run_training and land
    in the same loss regime (identical index draws; the only delta is u8
    target quantization of u8-sourced pixels = none)."""
    from dexnerf_tpu.config import CfgNode
    from dexnerf_tpu.data import write_blender_dataset
    from dexnerf_tpu.train import run_training

    base = str(tmp_path / "blender")
    write_blender_dataset(base, height=10, width=10, views_per_split=(2, 1, 1))

    def cfg(wire):
        return CfgNode({
            "experiment": {
                "id": f"wire-{wire}", "logdir": str(tmp_path / "logs"),
                "randomseed": 1, "train_iters": 4, "validate_every": 0,
                "save_every": 0, "print_every": 2,
            },
            "dataset": {
                "type": "blender", "basedir": base, "near": 2.0,
                "far": 6.0, "no_ndc": True, "host_store": True,
                "host_wire": wire,
            },
            "models": {
                "coarse": {
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
                    "num_random_rays": 32, "chunksize": 256,
                    "perturb": True, "num_coarse": 4, "num_fine": 0,
                    "white_background": False,
                    "radiance_field_noise_std": 0.0, "lindisp": False,
                },
                "validation": {
                    "chunksize": 256, "perturb": False, "num_coarse": 4,
                    "num_fine": 0, "white_background": False,
                    "radiance_field_noise_std": 0.0, "lindisp": False,
                },
            },
        })

    out_p = run_training(cfg("packed"))
    out_r = run_training(cfg("rows"))
    lp = float(out_p["final_train_metrics"]["loss"])
    lr = float(out_r["final_train_metrics"]["loss"])
    assert np.isfinite(lp) and np.isfinite(lr)
    # identical draws + lossless target -> identical trajectories up to
    # op-ordering noise
    assert abs(lp - lr) < 1e-4 * max(1.0, abs(lr))
