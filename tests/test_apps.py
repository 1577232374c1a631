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
