"""Multi-scene batched training (virtual 8-device CPU mesh).

The TPU-native replacement for the reference's one-k8s-job-per-scene
scale-out (``job-example.yaml``): scenes are vmapped over a leading axis
and sharded across the mesh with zero collectives.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexnerf_tpu.core.encoding import encoding_dim
from dexnerf_tpu.data import build_ray_store, make_synthetic_scene
from dexnerf_tpu.models import FlexibleNeRFModel
from dexnerf_tpu.parallel import (
    SCENE_AXIS,
    init_multi_scene_state,
    make_mesh,
    make_multi_scene_parallel_train_step,
    make_multi_scene_train_step,
    make_parallel_train_step,
    make_scene_data_mesh,
    make_scene_mesh,
    scene_params,
    scene_store,
    shard_multi_scene,
    stack_params,
    stack_ray_stores,
)
from dexnerf_tpu.render import RenderSettings
from dexnerf_tpu.train import init_train_state, make_optimizer, make_train_step

ENC_XYZ, ENC_DIR = 2, 1
SETTINGS = RenderSettings(
    num_coarse=4,
    num_fine=4,
    perturb=True,
    num_encoding_fn_xyz=ENC_XYZ,
    num_encoding_fn_dir=ENC_DIR,
)


def _model():
    return FlexibleNeRFModel(
        num_layers=2,
        hidden_size=16,
        num_encoding_fn_xyz=ENC_XYZ,
        num_encoding_fn_dir=ENC_DIR,
    )


def _scene_params(model, seed):
    in_dim = encoding_dim(3, ENC_XYZ) + encoding_dim(3, ENC_DIR)
    key = jax.random.PRNGKey(seed)
    return {
        "coarse": model.init(key, jnp.ones((1, in_dim))),
        "fine": model.init(jax.random.fold_in(key, 1), jnp.ones((1, in_dim))),
    }


def _stores(n, height=8, width=8):
    stores = []
    for s in range(n):
        images, _, poses, hwf = make_synthetic_scene(
            num_views=2, height=height, width=width, seed=s
        )
        stores.append(build_ray_store(images, poses, hwf, 2.0, 6.0))
    return stores


def test_stack_and_slice_roundtrip():
    stores = _stores(3)
    ms = stack_ray_stores(stores)
    assert ms.num_scenes == 3
    assert ms.num_rays == stores[0].num_rays
    back = scene_store(ms, 1)
    np.testing.assert_array_equal(back.data, stores[1].data)
    assert back.near == stores[1].near and back.far == stores[1].far
    assert back.rays_per_image == stores[1].rays_per_image


def test_stack_rejects_unequal_sizes():
    a = _stores(1, height=8, width=8)[0]
    b = _stores(1, height=8, width=4)[0]
    with pytest.raises(ValueError, match="different ray counts"):
        stack_ray_stores([a, b])


def test_multiscene_matches_single_scene_exactly():
    """Scene i's trajectory under the vmapped step is bit-identical to
    training it alone with make_train_step under fold_in(key, i)."""
    model = _model()
    stores = _stores(2)
    tx = make_optimizer(5e-3)
    params = [_scene_params(model, s) for s in range(2)]

    ms = stack_ray_stores(stores)
    mstate = init_multi_scene_state(stack_params(params), tx)
    mstep = make_multi_scene_train_step(
        model.apply, model.apply, tx, SETTINGS, batch_per_scene=32
    )

    sstep = make_train_step(model.apply, model.apply, tx, SETTINGS, 32)
    sstates = [init_train_state(p, tx) for p in params]

    key = jax.random.PRNGKey(7)
    for t in range(3):
        key, sub = jax.random.split(key)
        mstate, mmetrics = mstep(mstate, ms, sub)
        for i in range(2):
            sstates[i], smetrics = sstep(
                sstates[i], stores[i], jax.random.fold_in(sub, i)
            )
            assert np.allclose(
                float(mmetrics["loss"][i]), float(smetrics["loss"]),
                rtol=0, atol=1e-6,
            ), (t, i)
    for i in range(2):
        got = scene_params(mstate.params, i)
        want = sstates[i].params
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=0, atol=2e-6),
            got, want,
        )


def test_multiscene_sharded_over_mesh_descends():
    """8 scenes sharded over the 8-device mesh: no collectives, every
    scene's loss descends independently."""
    model = _model()
    n = 8
    stores = _stores(n)
    tx = make_optimizer(5e-3)
    stacked = stack_params([_scene_params(model, s) for s in range(n)])
    state = init_multi_scene_state(stacked, tx)
    ms = stack_ray_stores(stores)
    mesh = make_scene_mesh()
    state, ms = shard_multi_scene(state, ms, mesh)

    step = make_multi_scene_train_step(
        model.apply, model.apply, tx, SETTINGS, batch_per_scene=32,
        steps_per_call=5,
    )
    key = jax.random.PRNGKey(0)
    first = last = None
    for t in range(6):
        key, sub = jax.random.split(key)
        state, metrics = step(state, ms, sub)
        if first is None:
            first = np.asarray(metrics["loss"])
        last = np.asarray(metrics["loss"])
    assert last.shape == (n,)
    assert int(state.step) == 30
    # every scene trains (loss drops scene-by-scene, not just on average)
    assert (last < first).all(), (first, last)
    # the sharded layout survived the step (scene axis still split)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_scene_data_2d_matches_data_parallel_per_scene():
    """2 scenes x 4 data devices on the (scene, rays) mesh: scene i's
    trajectory is bit-identical to training it ALONE data-parallel over a
    4-device rays mesh under fold_in(key, i) — the composition invariant."""
    model = _model()
    stores = _stores(2)
    tx = make_optimizer(5e-3)
    params = [_scene_params(model, s) for s in range(2)]

    mesh2d = make_scene_data_mesh(2, 4)
    ms = stack_ray_stores(stores)
    mstate = init_multi_scene_state(stack_params(params), tx)
    mstate, ms = shard_multi_scene(mstate, ms, mesh2d)
    mstep = make_multi_scene_parallel_train_step(
        mesh2d, model.apply, model.apply, tx, SETTINGS, batch_per_scene=32
    )

    mesh1d = make_mesh(4)
    sstep = make_parallel_train_step(
        mesh1d, model.apply, model.apply, tx, SETTINGS, global_batch_size=32
    )
    from dexnerf_tpu.train import init_train_state

    sstates = [init_train_state(p, tx) for p in params]

    key = jax.random.PRNGKey(11)
    for t in range(3):
        key, sub = jax.random.split(key)
        mstate, mmetrics = mstep(mstate, ms, sub)
        assert np.asarray(mmetrics["loss"]).shape == (2,)
        for i in range(2):
            sstates[i], smetrics = sstep(
                sstates[i], stores[i], jax.random.fold_in(sub, i)
            )
            assert np.allclose(
                float(mmetrics["loss"][i]), float(smetrics["loss"]),
                rtol=0, atol=1e-6,
            ), (t, i)
    for i in range(2):
        got = scene_params(mstate.params, i)
        want = sstates[i].params
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=0, atol=2e-6),
            got, want,
        )


def test_scene_data_2d_scan_steps_descend():
    """4 scenes x 2 data devices, steps_per_call > 1: every scene's loss
    descends and the scene axis stays sharded."""
    model = _model()
    n = 4
    stores = _stores(n)
    tx = make_optimizer(5e-3)
    state = init_multi_scene_state(
        stack_params([_scene_params(model, s) for s in range(n)]), tx
    )
    ms = stack_ray_stores(stores)
    mesh = make_scene_data_mesh(4, 2)
    state, ms = shard_multi_scene(state, ms, mesh)
    step = make_multi_scene_parallel_train_step(
        mesh, model.apply, model.apply, tx, SETTINGS,
        batch_per_scene=32, steps_per_call=4,
    )
    key = jax.random.PRNGKey(0)
    first = last = None
    for t in range(5):
        key, sub = jax.random.split(key)
        state, metrics = step(state, ms, sub)
        if first is None:
            first = np.asarray(metrics["loss"])
        last = np.asarray(metrics["loss"])
    assert last.shape == (n,)
    assert int(state.step) == 20
    assert (last < first).all(), (first, last)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_scene_data_mesh_validation():
    mesh = make_scene_data_mesh(2, 4)
    model = _model()
    tx = make_optimizer(5e-3)
    with pytest.raises(ValueError, match="not divisible"):
        make_multi_scene_parallel_train_step(
            mesh, model.apply, model.apply, tx, SETTINGS, batch_per_scene=30
        )
    with pytest.raises(ValueError, match="scene, rays"):
        make_multi_scene_parallel_train_step(
            make_scene_mesh(), model.apply, model.apply, tx, SETTINGS,
            batch_per_scene=32,
        )
    with pytest.raises(ValueError, match="devices available"):
        make_scene_data_mesh(4, 4)


def test_shard_multi_scene_divisibility():
    stores = _stores(3)
    model = _model()
    tx = make_optimizer(5e-3)
    state = init_multi_scene_state(
        stack_params([_scene_params(model, s) for s in range(3)]), tx
    )
    ms = stack_ray_stores(stores)
    with pytest.raises(ValueError, match="not divisible"):
        shard_multi_scene(state, ms, make_scene_mesh())


def _tiny_cfg(tmp_path, base, ident, seed):
    cfgpath = str(tmp_path / f"{ident}.yml")
    with open(cfgpath, "w") as f:
        f.write(
            f"""
experiment:
  id: {ident}
  logdir: {tmp_path}/logs
  randomseed: {seed}
  train_iters: 4
  print_every: 2
dataset:
  type: blender
  basedir: {base}
  near: 2.0
  far: 6.0
  no_ndc: True
models:
  coarse:
    type: FlexibleNeRFModel
    num_layers: 2
    hidden_size: 16
    num_encoding_fn_xyz: 2
    num_encoding_fn_dir: 1
  fine:
    type: FlexibleNeRFModel
    num_layers: 2
    hidden_size: 16
    num_encoding_fn_xyz: 2
    num_encoding_fn_dir: 1
optimizer:
  type: Adam
  lr: 5.0e-3
scheduler:
  lr_decay: 250
  lr_decay_factor: 0.1
nerf:
  use_viewdirs: True
  train:
    num_random_rays: 16
    chunksize: 64
    perturb: True
    num_coarse: 4
    num_fine: 4
    white_background: False
    radiance_field_noise_std: 0.0
    lindisp: False
  validation:
    chunksize: 64
    perturb: False
    num_coarse: 4
    num_fine: 4
    white_background: False
    radiance_field_noise_std: 0.0
    lindisp: False
"""
        )
    return cfgpath


def test_multiscene_cli_e2e(tmp_path):
    """Two tiny scenes through the CLI: per-scene metrics.jsonl and
    checkpoints land in each config's own logdir, consumable by apps.eval."""
    import os

    from dexnerf_tpu.apps.eval import main as eval_main
    from dexnerf_tpu.apps.multiscene import main as ms_main
    from dexnerf_tpu.data import write_blender_dataset

    base = str(tmp_path / "blender")
    write_blender_dataset(base, height=12, width=12, views_per_split=(2, 1, 1))
    cfg_a = _tiny_cfg(tmp_path, base, "scene_a", 1)
    cfg_b = _tiny_cfg(tmp_path, base, "scene_b", 2)

    assert ms_main(["--configs", cfg_a, cfg_b, "--validate-every", "4"]) == 0
    for ident in ("scene_a", "scene_b"):
        logdir = f"{tmp_path}/logs/{ident}"
        assert os.path.exists(f"{logdir}/config.yml")
        with open(f"{logdir}/metrics.jsonl") as f:
            lines = [json.loads(l) for l in f if l.strip()]
        assert lines and lines[-1]["step"] == 4
        ckpts = os.listdir(f"{logdir}/checkpoints")
        assert any(c.startswith("checkpoint_") for c in ckpts)
        # per-scene full-frame validation: PSNR/SSIM rows + saved render
        val_rows = [l for l in lines if "val_psnr" in l]
        assert val_rows and "val_ssim" in val_rows[-1]
        assert os.path.exists(f"{logdir}/validation/rgb_0000004.png")

    # the per-scene checkpoint renders through the standard eval app
    savedir = str(tmp_path / "renders")
    rc = eval_main(
        [
            "--config", cfg_a,
            "--checkpoint", f"{tmp_path}/logs/scene_a/checkpoints",
            "--savedir", savedir,
            "--num-poses", "1",
        ]
    )
    assert rc == 0
    assert os.listdir(savedir)


def test_multiscene_cli_rejects_mismatched_models(tmp_path):
    from dexnerf_tpu.apps.multiscene import main as ms_main
    from dexnerf_tpu.data import write_blender_dataset

    base = str(tmp_path / "blender")
    write_blender_dataset(base, height=12, width=12, views_per_split=(2, 1, 1))
    cfg_a = _tiny_cfg(tmp_path, base, "scene_a", 1)
    cfg_b = _tiny_cfg(tmp_path, base, "scene_b", 2)
    with open(cfg_b) as f:
        txt = f.read()
    with open(cfg_b, "w") as f:
        f.write(txt.replace("hidden_size: 16", "hidden_size: 32", 1))
    with pytest.raises(SystemExit, match="models section differs"):
        ms_main(["--configs", cfg_a, cfg_b])
