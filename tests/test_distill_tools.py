"""Tests for the dataset-from-checkpoint distillation tools."""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)


def test_llff_storage_convention_roundtrip(tmp_path):
    """The LLFF generator's inverse of the loader's axis fixup must be
    exact: poses written to poses_bounds.npy and read back through
    load_llff_data (raw mode) reproduce the intended c2w columns."""
    import imageio.v2 as imageio

    from dexnerf_tpu.data.llff import load_llff_data

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from make_llff_dataset_from_ckpt import _lookat_c2w

    H, W, focal = 24, 32, 30.0
    rng = np.random.default_rng(3)
    rows, want = [], []
    for _ in range(3):
        pos = rng.uniform(-0.2, 0.2, 3)
        c2w = _lookat_c2w(pos, np.array([0.0, 0.0, -2.0]))
        # orthonormal, right-handed, looking roughly along -z
        R = c2w[:, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-12)
        assert np.linalg.det(R) > 0.99
        assert (-R[:, 2]) @ np.array([0, 0, -1.0]) > 0.9
        hwf = np.array([[H], [W], [focal]])
        loaded = np.concatenate([c2w, hwf], axis=1)
        storage = np.concatenate(
            [-loaded[:, 1:2], loaded[:, 0:1], loaded[:, 2:]], axis=1
        )
        rows.append(np.concatenate([storage.reshape(-1), [1.0, 8.0]]))
        want.append(loaded)

    base = str(tmp_path / "llff")
    os.makedirs(os.path.join(base, "images"))
    np.save(os.path.join(base, "poses_bounds.npy"), np.stack(rows, 0))
    for k in range(3):
        imageio.imwrite(
            os.path.join(base, "images", f"r_{k}.png"),
            np.zeros((H, W, 3), np.uint8),
        )

    # raw mode: no recenter, no bd rescale -> the loader output IS the
    # fixup of the stored poses
    _, poses, bds, _, _ = load_llff_data(
        base, factor=1, recenter=False, bd_factor=None
    )
    assert poses.shape == (3, 3, 5)
    for k in range(3):
        np.testing.assert_allclose(poses[k], want[k], atol=1e-6)
    np.testing.assert_allclose(bds, np.tile([1.0, 8.0], (3, 1)))


def test_llff_generator_phase_consistency(tmp_path):
    """The generator's phase-B re-load sees the SAME poses a later
    training-time load sees (pose transforms depend only on
    poses_bounds.npy + image shape, never on pixel content)."""
    import imageio.v2 as imageio

    from dexnerf_tpu.data.llff import load_llff_data

    H, W = 24, 32
    rng = np.random.default_rng(0)
    rows = []
    for _ in range(4):
        m = np.eye(3) + 0.01 * rng.standard_normal((3, 3))
        q, _ = np.linalg.qr(m)
        c2w = np.concatenate([q, rng.uniform(-0.2, 0.2, (3, 1))], axis=1)
        loaded = np.concatenate([c2w, [[H], [W], [30.0]]], axis=1)
        storage = np.concatenate(
            [-loaded[:, 1:2], loaded[:, 0:1], loaded[:, 2:]], axis=1
        )
        rows.append(np.concatenate([storage.reshape(-1), [4.0 / 3.0, 8.0]]))
    base = str(tmp_path / "llff")
    os.makedirs(os.path.join(base, "images"))
    np.save(os.path.join(base, "poses_bounds.npy"), np.stack(rows, 0))
    for k in range(4):
        imageio.imwrite(
            os.path.join(base, "images", f"r_{k}.png"),
            np.zeros((H, W, 3), np.uint8),
        )
    _, poses_a, bds_a, _, _ = load_llff_data(base, factor=1)
    # overwrite with "real" content, as phase B does
    for k in range(4):
        imageio.imwrite(
            os.path.join(base, "images", f"r_{k}.png"),
            np.full((H, W, 3), 57, np.uint8),
        )
        imageio.imwrite(
            os.path.join(base, "images_1", f"r_{k}.png"),
            np.full((H, W, 3), 57, np.uint8),
        )
    imgs, poses_b, bds_b, _, _ = load_llff_data(base, factor=1)
    np.testing.assert_array_equal(poses_a, poses_b)
    np.testing.assert_array_equal(bds_a, bds_b)
    assert abs(float(imgs.mean()) - 57.0 / 255.0) < 1e-6
    # the default bounds make the loader's bd rescale exactly 1
    np.testing.assert_allclose(bds_b[:, 0], 4.0 / 3.0, rtol=1e-6)


def test_messytable_generator_loader_roundtrip(tmp_path):
    """--format messytable out of a real reference checkpoint: the stored
    2x image/depth halve back through load_messytable_data to the exact
    rendered geometry, the meta w2c/K drive get_ray_bundle_w2c rays whose
    re-render matches the loaded image, and the GT depth unprojects onto
    the same surfaces the expected depth reports."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dexnerf_tpu.core.rays import get_ray_bundle_w2c
    from dexnerf_tpu.data.messytable import load_messytable_data
    from tools.make_dataset_from_ckpt import main as gen_main

    pre = "/root/reference/nerf-pytorch/pretrained/lego-lowres"
    ckpt = sorted(
        p for p in os.listdir(pre) if p.startswith("checkpoint")
    )[-1]
    base = str(tmp_path / "mt")
    H, W, focal = 16, 28, 38.9
    rc = gen_main([
        "--config", os.path.join(pre, "config.yml"),
        "--checkpoint", os.path.join(pre, ckpt),
        "--hwf", str(H), str(W), str(focal),
        "--out", base, "--format", "messytable",
        "--views", "2", "1", "1", "--platform", "cpu",
    ])
    assert rc == 0

    imgs, poses, _, hwf, i_split, intrinsics, depths = load_messytable_data(
        base, half_res=False
    )
    assert imgs.shape == (4, H, W, 3)
    assert depths.shape == (4, H, W)
    assert [len(s) for s in i_split] == [2, 1, 1]
    # meta K is the OUTPUT-resolution intrinsics, untouched by the loader
    np.testing.assert_allclose(intrinsics[0][0, 0], focal, rtol=1e-6)
    np.testing.assert_allclose(intrinsics[0][0, 2], W / 2.0, rtol=1e-6)
    # w2c rotation block is orthonormal
    R = poses[0][:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)

    # re-render view 0 through the LOADER's ray convention and compare to
    # the loaded image: geometry is consistent end to end
    from dexnerf_tpu.config import load_config, render_settings_from_cfg
    from dexnerf_tpu.render import render_image
    from dexnerf_tpu.train.loop import load_eval_params, setup_models

    cfg = load_config(os.path.join(pre, "config.yml"))
    cfg, params, _, _ = load_eval_params(cfg, os.path.join(pre, ckpt))
    coarse_fn, fine_fn, _ = setup_models(cfg, 0)
    s_val = render_settings_from_cfg(cfg, "validation").eval_variant()
    ro, rd = get_ray_bundle_w2c(
        H, W, jnp.asarray(poses[0], jnp.float64),
        jnp.asarray(intrinsics[0], jnp.float64),
    )
    out = render_image(
        coarse_fn, fine_fn, params, ro, rd,
        float(cfg.dataset.near), float(cfg.dataset.far), s_val,
    )
    rgb = np.asarray(out.fine.rgb)
    gray = rgb.mean(-1)
    # stored as uint8 gray at 2x, nearest-halved back: quantization only
    np.testing.assert_allclose(gray, imgs[0][..., 0], atol=2.5 / 255.0)
    # depth: stored mm uint16, zeroed where acc < 0.5
    acc = np.asarray(out.fine.accumulation)
    d = np.asarray(out.fine.depth)
    want = np.where(acc > 0.5, d, 0.0)
    np.testing.assert_allclose(depths[0], want, atol=2e-3)


def test_llff_generator_depth_sidecars_and_eval(tmp_path):
    """LLFF/NDC depth round 5: the generator writes metric-unit teacher
    depth sidecars (expected + σ-surface, NDC-converted through
    core.rays.ndc_t_to_world_depth), the llff loader finds them, and
    apps.eval --test-set --dex-depth scores the student in the SAME unit
    system. Self-consistency: the teacher checkpoint evaluated against
    its own sidecars must read ~0 σ-surface error."""
    import json

    import yaml

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from make_llff_dataset_from_ckpt import main as mk_main

    from dexnerf_tpu.apps.eval import main as eval_main
    from dexnerf_tpu.config import load_config
    from dexnerf_tpu.train import init_train_state, make_optimizer
    from dexnerf_tpu.train.checkpoints import save_checkpoint
    from dexnerf_tpu.train.loop import load_scene, setup_models

    out = str(tmp_path / "llff")
    cfg_dict = {
        "experiment": {"id": "exp", "logdir": str(tmp_path),
                       "randomseed": 1, "train_iters": 1,
                       "validate_every": 1, "save_every": 1,
                       "print_every": 1},
        "dataset": {"type": "llff", "basedir": out,
                    "downsample_factor": 1, "llffhold": 8,
                    "no_ndc": False, "near": 0, "far": 1,
                    "depth_valid_max": 20.0},
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
                           "lindisp": False, "m_thres": 20},
        },
    }
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict, f)
    cfg = load_config(cfg_path)
    _, _, params = setup_models(cfg, 1)
    # a freshly initialized field is too thin for NDC sampling to reach
    # acc > 0.5 anywhere — push the σ head's bias up so every ray hits
    # (Dense_3 is FlexibleNeRFModel's 1-wide alpha head)
    for sub in ("coarse", "fine"):
        head = params[sub]["params"]["Dense_3"]
        head["bias"] = head["bias"] + 8.0
    state = init_train_state(params, make_optimizer(5e-3))
    ckpt_dir = str(tmp_path / "checkpoints")
    save_checkpoint(ckpt_dir, 1, state)

    rc = mk_main([
        "--config", cfg_path, "--checkpoint", ckpt_dir, "--out", out,
        "--views", "8", "--size", "10", "12", "--focal", "10.0",
        "--save-depth", "--depth-dex-m", "5", "--platform", "cpu",
    ])
    assert rc == 0

    d_exp = np.load(os.path.join(out, "depths", "d_0.npy"))
    d_dex = np.load(os.path.join(out, "depths", "d_dex_0.npy"))
    assert d_exp.shape == (10, 12) and np.isfinite(d_dex).all()
    # metric units: the dense fog surfaces at the near plane, so depths
    # sit near the ~1-unit near-plane distance — not the ~0.1 NDC
    # parameter an unconverted sidecar would carry
    hits = d_exp > 0
    assert hits.any(), "dense field never reached acc>0.5 — vacuous test"
    assert float(d_exp[hits].min()) > 0.5
    np.testing.assert_array_equal(d_dex[d_exp == 0.0], 0.0)
    with open(os.path.join(out, "source.json")) as f:
        src = json.load(f)
    assert src["depth_sidecars"] is True and src["depth_dex_m"] == 5.0

    # the llff loader attaches the sidecars to the scene
    scene = load_scene(cfg)
    assert scene.depths is not None and scene.depths.shape[0] == 8
    assert scene.use_ndc

    # eval: sweep against σ-surface sidecars, converted student depths
    savedir = str(tmp_path / "renders")
    rc = eval_main([
        "--config", cfg_path, "--checkpoint", ckpt_dir,
        "--savedir", savedir, "--test-set", "--dex-depth",
        "--platform", "cpu",
    ])
    assert rc == 0
    with open(os.path.join(savedir, "metrics.json")) as f:
        report = json.load(f)
    assert report["dex_gt"] == "sigma_sidecar"
    mean = report["mean"]
    # teacher-vs-own-sidecar: the σ-surface read is exact under the
    # shared NDC→world conversion
    assert mean["dex_abs_err"] < 1e-3
    assert np.isfinite(mean["depth_abs_err"])
