"""CLI apps: cache shard schema, cached-store training path, tiny smoke."""

import os

import jax
import numpy as np
import pytest

from dexnerf_tpu.data import (
    build_ray_store_from_cache,
    sample_ray_batch,
    write_blender_dataset,
)


@pytest.fixture(scope="module")
def blender_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("data") / "blender")
    write_blender_dataset(d, height=25, width=25, views_per_split=(2, 1, 1))
    return d


def test_cache_app_writes_reference_schema(blender_dir, tmp_path):
    from dexnerf_tpu.apps.cache import build_parser, cache_nerf_dataset

    savedir = str(tmp_path / "cache")
    args = build_parser().parse_args(
        [
            "--datapath", blender_dir,
            "--type", "blender",
            "--savedir", savedir,
            "--num-random-rays", "64",
            "--num-variations", "2",
        ]
    )
    cache_nerf_dataset(args)

    train_shards = sorted(os.listdir(os.path.join(savedir, "train")))
    assert len(train_shards) == 2 * 2  # 2 train imgs x 2 variations
    with np.load(os.path.join(savedir, "train", train_shards[0])) as z:
        assert set(z.files) >= {
            "height", "width", "focal_length", "ray_bundle", "target",
        }
        assert z["ray_bundle"].shape == (2, 64, 3)
        assert z["target"].shape == (64, 3)

    val_shards = os.listdir(os.path.join(savedir, "val"))
    assert len(val_shards) == 1
    with np.load(os.path.join(savedir, "val", val_shards[0])) as z:
        assert z["ray_origins"].shape == (25, 25, 3)
        assert z["target"].shape == (25, 25, 3)

    # cached shards feed the device ray store (USE_CACHED_DATASET parity)
    store = build_ray_store_from_cache(savedir, 2.0, 6.0)
    assert store.data.shape == (4 * 64, 12)
    rays, target = sample_ray_batch(store, jax.random.PRNGKey(0), 16)
    assert rays.origins.shape == (16, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rays.viewdirs), axis=-1), 1.0, rtol=1e-5
    )


def test_cache_store_missing_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        build_ray_store_from_cache(str(tmp_path / "nope"), 2.0, 6.0)


def test_reference_torch_cache_trains_our_store(tmp_path):
    """A reference-written torch.save ``.data`` cache dir feeds our ray
    store directly (schema per cache_dataset.py:104-115; consumption per
    train_nerf_rgb.py:186-204 — target may be RGBA, reader takes [..., :3])."""
    torch = pytest.importorskip("torch")

    rng = np.random.RandomState(0)
    os.makedirs(tmp_path / "train")
    n = 32
    bundles = []
    for i in range(2):
        ro = rng.randn(n, 3).astype(np.float32)
        rd = rng.randn(n, 3).astype(np.float32)
        tgt = rng.rand(n, 4).astype(np.float32)  # RGBA like blender images
        torch.save(
            {
                "height": 25, "width": 25, "focal_length": 20.0,
                "ray_bundle": torch.from_numpy(np.stack([ro, rd], 0)),
                "target": torch.from_numpy(tgt),
            },
            str(tmp_path / "train" / f"{i:04d}.data"),
        )
        bundles.append((ro, rd, tgt))

    store = build_ray_store_from_cache(str(tmp_path), 2.0, 6.0)
    assert store.data.shape == (2 * n, 12)
    got = np.asarray(store.data)
    np.testing.assert_allclose(got[:n, 0:3], bundles[0][0], rtol=1e-6)
    np.testing.assert_allclose(got[:n, 9:12], bundles[0][2][:, :3], rtol=1e-6)


def test_cache_app_torch_format_reads_back_in_torch(blender_dir, tmp_path):
    """--torch-format writes .data shards the reference stack can
    torch.load, and our own store reader accepts them too."""
    torch = pytest.importorskip("torch")

    from dexnerf_tpu.apps.cache import build_parser, cache_nerf_dataset

    savedir = str(tmp_path / "cache_t")
    args = build_parser().parse_args(
        [
            "--datapath", blender_dir,
            "--type", "blender",
            "--savedir", savedir,
            "--num-random-rays", "64",
            "--torch-format",
        ]
    )
    cache_nerf_dataset(args)

    shards = sorted(os.listdir(os.path.join(savedir, "train")))
    assert shards and all(s.endswith(".data") for s in shards)
    d = torch.load(
        os.path.join(savedir, "train", shards[0]),
        map_location="cpu", weights_only=False,
    )
    assert torch.is_tensor(d["ray_bundle"])
    assert tuple(d["ray_bundle"].shape) == (2, 64, 3)
    store = build_ray_store_from_cache(savedir, 2.0, 6.0)
    assert store.data.shape[0] == len(shards) * 64


def test_tiny_app_smoke(tmp_path):
    from dexnerf_tpu.apps.tiny import main

    out = str(tmp_path / "tiny_out")
    rc = main(
        [
            "--outdir", out,
            "--iters", "2",
            "--num-samples", "4",
            "--batch-rays", "16",
            "--display-every", "1",
        ]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(out, "psnr.txt"))
    assert any(f.startswith("render_") for f in os.listdir(out))
    # matplotlib snapshot grid (reference tiny_nerf.py:302-332)
    assert any(f.startswith("snapshot_") for f in os.listdir(out))


def test_train_app_parser_modes():
    from dexnerf_tpu.apps.train import build_parser

    args = build_parser().parse_args(
        ["--config", "x.yml", "--dex", "--ir", "--max-iters", "7"]
    )
    assert args.dex and args.ir and args.max_iters == 7


def test_optimizer_registry():
    from dexnerf_tpu.train.step import OPTIMIZER_REGISTRY, make_optimizer

    assert {"Adam", "SGD", "AdamW"} <= set(OPTIMIZER_REGISTRY)
    tx = make_optimizer(1e-3, opt_type="SGD")
    assert tx is not None
    with pytest.raises(KeyError):
        make_optimizer(1e-3, opt_type="Nadamax")


def test_export_app_roundtrips_reference_ckpt(tmp_path):
    """apps.export: orbax checkpoint -> reference .ckpt -> import parity."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    import yaml

    from dexnerf_tpu.apps.export import main as export_main
    from dexnerf_tpu.config import load_config
    from dexnerf_tpu.train import (
        import_torch_checkpoint,
        init_train_state,
        make_optimizer,
    )
    from dexnerf_tpu.train.checkpoints import save_checkpoint
    from dexnerf_tpu.train.loop import setup_models

    cfg_dict = {
        "experiment": {"id": "exp", "logdir": str(tmp_path), "randomseed": 1,
                       "train_iters": 1, "validate_every": 1,
                       "save_every": 1, "print_every": 1},
        "dataset": {"type": "blender", "basedir": str(tmp_path / "nodata"),
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
    tx = make_optimizer(5e-3)
    state = init_train_state(params, tx)
    # one update so the exported Adam moments are nonzero
    grads = jax.tree.map(jnp.ones_like, params)
    updates, opt_state = tx.update(grads, state.opt_state, params)
    state = state._replace(
        step=jnp.asarray(7, jnp.int32), opt_state=opt_state
    )
    ckpt_dir = str(tmp_path / "checkpoints")
    save_checkpoint(ckpt_dir, 7, state)

    out_ckpt = str(tmp_path / "exported.ckpt")
    rc = export_main(["--config", cfg_path, "--checkpoint", ckpt_dir,
                      "--out", out_ckpt])
    assert rc == 0

    imported = import_torch_checkpoint(out_ckpt)
    assert imported["step"] == 7
    assert "optimizer_state_dict" in imported
    want = params["coarse"]["params"]
    got = imported["coarse"]["params"]
    for name in want:
        np.testing.assert_allclose(
            got[name]["kernel"], np.asarray(want[name]["kernel"]), atol=0
        )


def test_eval_test_set_metrics(blender_dir, tmp_path):
    """apps.eval --test-set: held-out views scored against GT, per-image and
    mean PSNR/SSIM written to <savedir>/metrics.json (beyond the reference's
    pose-path-only eval, eval_nerf.py)."""
    import json

    import yaml

    from dexnerf_tpu.apps.eval import main as eval_main
    from dexnerf_tpu.train import init_train_state, make_optimizer
    from dexnerf_tpu.train.checkpoints import save_checkpoint
    from dexnerf_tpu.config import load_config
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
    ])
    assert rc == 0
    with open(os.path.join(savedir, "metrics.json")) as f:
        report = json.load(f)
    assert report["per_image"] and "mean" in report
    row = report["per_image"][0]
    assert {"index", "psnr", "ssim"} <= set(row)
    assert -1.0 <= row["ssim"] <= 1.0
    assert np.isfinite(row["psnr"])
    assert os.path.exists(os.path.join(savedir, "0000.png"))
    # --test-set and --refined-poses are mutually exclusive
    with pytest.raises(SystemExit, match="pick one"):
        eval_main([
            "--config", cfg_path, "--checkpoint", ckpt_dir,
            "--savedir", savedir, "--test-set", "--refined-poses",
        ])


def test_eval_test_set_messytable_depth_metrics(tmp_path):
    """--test-set on a messytable scene: w2c/full-K test rays plus mm depth
    metrics (the dataset carries GT depth) in metrics.json."""
    import json

    import yaml

    from dexnerf_tpu.apps.eval import main as eval_main
    from dexnerf_tpu.config import load_config
    from dexnerf_tpu.data import write_messytable_dataset
    from dexnerf_tpu.train import init_train_state, make_optimizer
    from dexnerf_tpu.train.checkpoints import save_checkpoint
    from dexnerf_tpu.train.loop import setup_models

    base = str(tmp_path / "mt")
    write_messytable_dataset(base, height=25, width=25,
                             views_per_split=(2, 1, 1))
    cfg_dict = {
        "experiment": {"id": "exp", "logdir": str(tmp_path), "randomseed": 1,
                       "train_iters": 1, "validate_every": 1,
                       "save_every": 1, "print_every": 1},
        "dataset": {"type": "messytable", "basedir": base,
                    "near": 2.0, "far": 6.0, "no_ndc": True,
                    "depth_valid_max": 6.0},
        "models": {
            "coarse": {"type": "FlexibleNeRFModel", "num_layers": 2,
                       "hidden_size": 16, "num_encoding_fn_xyz": 2,
                       "num_encoding_fn_dir": 1},
        },
        "optimizer": {"type": "Adam", "lr": 5.0e-3},
        "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
        "nerf": {
            "use_viewdirs": True,
            "train": {"num_random_rays": 16, "chunksize": 64,
                      "perturb": True, "num_coarse": 4, "num_fine": 0,
                      "white_background": False,
                      "radiance_field_noise_std": 0.0, "lindisp": False},
            "validation": {"chunksize": 64, "perturb": False,
                           "num_coarse": 4, "num_fine": 0,
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
        "--savedir", savedir, "--test-set", "--num-poses", "1",
    ])
    assert rc == 0
    with open(os.path.join(savedir, "metrics.json")) as f:
        report = json.load(f)
    row = report["per_image"][0]
    assert {"psnr", "ssim", "depth_abs_err", "depth_rmse"} <= set(row)
    assert row["depth_abs_err"] > 0  # untrained model: real mm error
    assert "depth_rmse" in report["mean"]


def test_eval_dataset_free_reference_ckpt(tmp_path):
    """apps.eval renders a reference .ckpt WITHOUT the training dataset on
    disk (blender path): render poses synthesize from the checkpoint's own
    H/W/focal — and the declared-vs-actual architecture mismatch every
    shipped pretrained config carries is reconciled from the weights."""
    pytest.importorskip("torch")
    import yaml

    from dexnerf_tpu.apps.eval import main as eval_main
    from dexnerf_tpu.config import load_config
    from dexnerf_tpu.train.checkpoints import export_torch_checkpoint
    from dexnerf_tpu.train.loop import setup_models

    def cfg_dict(layers, hidden):
        blk = {"type": "FlexibleNeRFModel", "num_layers": layers,
               "hidden_size": hidden, "num_encoding_fn_xyz": 2,
               "num_encoding_fn_dir": 1}
        return {
            "experiment": {"id": "e", "logdir": str(tmp_path),
                           "randomseed": 1, "train_iters": 1,
                           "validate_every": 1, "save_every": 1,
                           "print_every": 1},
            "dataset": {"type": "blender",
                        "basedir": str(tmp_path / "missing_dataset"),
                        "near": 2.0, "far": 6.0, "no_ndc": True},
            "models": {"coarse": dict(blk), "fine": dict(blk)},
            "optimizer": {"type": "Adam", "lr": 5.0e-3},
            "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
            "nerf": {
                "use_viewdirs": True,
                "train": {"num_random_rays": 8, "chunksize": 64,
                          "perturb": True, "num_coarse": 3, "num_fine": 3,
                          "white_background": False,
                          "radiance_field_noise_std": 0.0,
                          "lindisp": False},
                "validation": {"chunksize": 64, "perturb": False,
                               "num_coarse": 3, "num_fine": 3,
                               "white_background": False,
                               "radiance_field_noise_std": 0.0,
                               "lindisp": False},
            },
        }

    # weights are 2x16 — written from a MATCHING config
    src_cfg_path = str(tmp_path / "src.yml")
    with open(src_cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict(2, 16), f)
    _, _, params = setup_models(load_config(src_cfg_path), 1)
    ckpt = str(tmp_path / "checkpoint00005.ckpt")
    export_torch_checkpoint(ckpt, params, step=5, hwf=(12, 12, 15.0))

    # eval config DECLARES 8x256 (the shipped pretrained quirk) and points
    # at a dataset that does not exist
    eval_cfg_path = str(tmp_path / "eval.yml")
    with open(eval_cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict(8, 256), f)
    savedir = str(tmp_path / "renders")
    rc = eval_main([
        "--config", eval_cfg_path, "--checkpoint", ckpt,
        "--savedir", savedir, "--num-poses", "2", "--platform", "cpu",
    ])
    assert rc == 0
    import imageio.v2 as imageio

    img = imageio.imread(os.path.join(savedir, "0000.png"))
    assert img.shape[:2] == (12, 12)
    assert os.path.exists(os.path.join(savedir, "0001.png"))


def test_make_dataset_from_ckpt_roundtrip(tmp_path):
    """tools/make_dataset_from_ckpt.py: a checkpoint's renders become a
    loadable blender-format dataset (the hermetic real-scene training
    drive's data generator; reference ships checkpoints but no datasets)."""
    import json

    import yaml

    sys_tools = os.path.join(os.path.dirname(os.path.dirname(__file__)))
    import sys

    sys.path.insert(0, os.path.join(sys_tools, "tools"))
    from make_dataset_from_ckpt import main as mk_main

    from dexnerf_tpu.config import load_config
    from dexnerf_tpu.data.blender import load_blender_data
    from dexnerf_tpu.train import init_train_state, make_optimizer
    from dexnerf_tpu.train.checkpoints import save_checkpoint
    from dexnerf_tpu.train.loop import setup_models

    cfg_dict = {
        "experiment": {"id": "exp", "logdir": str(tmp_path), "randomseed": 1,
                       "train_iters": 1, "validate_every": 1,
                       "save_every": 1, "print_every": 1},
        "dataset": {"type": "blender", "basedir": str(tmp_path / "none"),
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

    out = str(tmp_path / "views")
    rc = mk_main([
        "--config", cfg_path, "--checkpoint", ckpt_dir, "--out", out,
        "--hwf", "10", "12", "14.0", "--views", "3", "1", "2",
        "--save-depth", "--platform", "cpu",
    ])
    assert rc == 0

    images, poses, render_poses, hwf, i_split = load_blender_data(out)
    assert images.shape == (6, 10, 12, 3)
    assert [len(s) for s in i_split] == [3, 1, 2]
    assert hwf[0] == 10 and hwf[1] == 12
    assert abs(hwf[2] - 14.0) < 1e-3
    assert np.isfinite(images).all() and images.min() >= 0.0
    # poses roundtrip through the JSON as valid c2w (orthonormal rotation)
    R = poses[0][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    # camera sits on the requested orbit radius
    np.testing.assert_allclose(
        np.linalg.norm(poses[0][:3, 3]), 4.0, atol=1e-4
    )
    # test-split depth sidecars written
    assert os.path.exists(os.path.join(out, "test", "d_0.npy"))
    d = np.load(os.path.join(out, "test", "d_1.npy"))
    assert d.shape == (10, 12)
    with open(os.path.join(out, "source.json")) as f:
        src = json.load(f)
    assert src["hwf"] == [10, 12, 14.0]


def test_generator_dex_sidecars_and_eval_dex_depth(tmp_path):
    """--save-depth-dex writes σ-surface sidecars the d_dex_ loader prefix
    finds, and apps.eval --test-set --dex-depth runs the reference's
    threshold sweep + min-abs-err selection against them
    (train_dexnerf_rgb.py:393-427). Expected depth is unconstrained on
    textureless surfaces (docs/TEACHER_DEPTH_AMBIGUITY.json), so the
    surface-vs-surface column is the trustworthy geometric comparison."""
    import json

    import yaml

    sys_tools = os.path.join(os.path.dirname(os.path.dirname(__file__)))
    import sys

    sys.path.insert(0, os.path.join(sys_tools, "tools"))
    from make_dataset_from_ckpt import main as mk_main

    from dexnerf_tpu.apps.eval import main as eval_main
    from dexnerf_tpu.config import load_config
    from dexnerf_tpu.data.blender import load_blender_depths
    from dexnerf_tpu.train import init_train_state, make_optimizer
    from dexnerf_tpu.train.checkpoints import save_checkpoint
    from dexnerf_tpu.train.loop import setup_models

    cfg_dict = {
        "experiment": {"id": "exp", "logdir": str(tmp_path), "randomseed": 1,
                       "train_iters": 1, "validate_every": 1,
                       "save_every": 1, "print_every": 1},
        "dataset": {"type": "blender", "basedir": str(tmp_path / "views"),
                    "near": 2.0, "far": 6.0, "no_ndc": True,
                    "depth_valid_max": 100.0},
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
    state = init_train_state(params, make_optimizer(5e-3))
    ckpt_dir = str(tmp_path / "checkpoints")
    save_checkpoint(ckpt_dir, 1, state)

    out = str(tmp_path / "views")
    rc = mk_main([
        "--config", cfg_path, "--checkpoint", ckpt_dir, "--out", out,
        "--hwf", "10", "12", "14.0", "--views", "3", "1", "2",
        "--save-depth", "--save-depth-dex", "5", "--platform", "cpu",
    ])
    assert rc == 0

    # dex sidecars exist for the test split, acc-masked like d_{k}
    d_exp = np.load(os.path.join(out, "test", "d_0.npy"))
    d_dex = np.load(os.path.join(out, "test", "d_dex_0.npy"))
    assert d_dex.shape == d_exp.shape and np.isfinite(d_dex).all()
    np.testing.assert_array_equal(d_dex[d_exp == 0.0], 0.0)
    with open(os.path.join(out, "source.json")) as f:
        assert json.load(f)["depth_dex_m"] == 5.0

    # loader prefix finds them, aligned with the global view order
    dex_all = load_blender_depths(out, prefix="d_dex_")
    assert dex_all is not None and dex_all.shape[0] == 6
    np.testing.assert_array_equal(dex_all[4], d_dex)  # first test view

    # eval scores the sweep against the σ-surface sidecars
    savedir = str(tmp_path / "renders")
    rc = eval_main([
        "--config", cfg_path, "--checkpoint", ckpt_dir,
        "--savedir", savedir, "--test-set", "--dex-depth",
        "--platform", "cpu",
    ])
    assert rc == 0
    with open(os.path.join(savedir, "metrics.json")) as f:
        mean = json.load(f)["mean"]
    # sweep grid arange(5, 25, 5): the selected threshold is one of them
    assert mean["dex_best_m"] in {5.0, 10.0, 15.0, 20.0} or (
        5.0 <= mean["dex_best_m"] <= 20.0  # per-view means may average
    )
    for k in ("dex_abs_err", "dex_rmse", "dex_err8"):
        assert np.isfinite(mean[k])
    # the checkpoint the sidecars came from is the model being evaluated:
    # σ-surface depth must agree with itself far better than the random
    # field's expected depth agrees with anything
    assert mean["dex_abs_err"] < 1e-3
