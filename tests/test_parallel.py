"""Multi-chip (virtual 8-device CPU mesh): sharded train step + tiled render."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexnerf_tpu.core.encoding import encoding_dim
from dexnerf_tpu.data import build_ray_store, make_synthetic_scene, sample_ray_batch
from dexnerf_tpu.models import FlexibleNeRFModel
from dexnerf_tpu.parallel import make_mesh, make_parallel_render, make_parallel_train_step
from dexnerf_tpu.render import RayBatch, RenderSettings, render_rays
from dexnerf_tpu.train import init_train_state, make_optimizer

ENC_XYZ, ENC_DIR = 2, 1
SETTINGS = RenderSettings(
    num_coarse=4,
    num_fine=4,
    perturb=True,
    num_encoding_fn_xyz=ENC_XYZ,
    num_encoding_fn_dir=ENC_DIR,
)


def _setup():
    model = FlexibleNeRFModel(
        num_layers=2,
        hidden_size=16,
        num_encoding_fn_xyz=ENC_XYZ,
        num_encoding_fn_dir=ENC_DIR,
    )
    in_dim = encoding_dim(3, ENC_XYZ) + encoding_dim(3, ENC_DIR)
    key = jax.random.PRNGKey(0)
    params = {
        "coarse": model.init(key, jnp.ones((1, in_dim))),
        "fine": model.init(jax.random.fold_in(key, 1), jnp.ones((1, in_dim))),
    }
    return model.apply, params


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_parallel_train_step_runs_and_descends():
    apply_fn, params = _setup()
    mesh = make_mesh()
    images, _, poses, hwf = make_synthetic_scene(num_views=2, height=8, width=8)
    store = build_ray_store(images, poses, hwf, 2.0, 6.0)
    tx = make_optimizer(5e-3)
    state = init_train_state(params, tx)
    step = make_parallel_train_step(
        mesh, apply_fn, apply_fn, tx, SETTINGS, global_batch_size=64
    )
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        state, metrics = step(state, store, sub)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # params stayed synchronized (replicated): single device_get works
    _ = jax.device_get(state.params)


def test_parallel_batch_divisibility_check():
    apply_fn, params = _setup()
    mesh = make_mesh()
    tx = make_optimizer(5e-3)
    with pytest.raises(ValueError):
        make_parallel_train_step(
            mesh, apply_fn, apply_fn, tx, SETTINGS, global_batch_size=12
        )


def test_parallel_render_matches_single_device():
    apply_fn, params = _setup()
    mesh = make_mesh()
    s_det = SETTINGS.eval_variant()
    n = 64  # divisible by 8
    rd = jax.random.normal(jax.random.PRNGKey(5), (n, 3))
    rays = RayBatch(
        origins=jnp.zeros((n, 3)),
        directions=rd,
        viewdirs=rd / jnp.linalg.norm(rd, axis=-1, keepdims=True),
        near=jnp.full((n,), 2.0),
        far=jnp.full((n,), 6.0),
    )
    par_render = make_parallel_render(mesh, apply_fn, apply_fn, s_det)
    out_par = par_render(params, rays)
    out_seq = render_rays(apply_fn, apply_fn, params, rays, None, s_det)
    np.testing.assert_allclose(
        np.asarray(out_par.fine.rgb), np.asarray(out_seq.fine.rgb), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_par.fine.depth), np.asarray(out_seq.fine.depth), atol=1e-5
    )


def test_render_image_parallel_matches_single_device():
    """Full-frame tiling across the mesh == single-device render_image,
    including padding (27 rows of 9 px = 243 rays, not divisible by 8)."""
    from dexnerf_tpu.parallel import render_image_parallel
    from dexnerf_tpu.render import render_image

    apply_fn, params = _setup()
    mesh = make_mesh()
    s_det = SETTINGS.eval_variant()
    H, W = 27, 9
    key = jax.random.PRNGKey(9)
    ro = jax.random.normal(key, (H, W, 3)) * 0.1
    rd = jax.random.normal(jax.random.fold_in(key, 1), (H, W, 3))

    out_par = render_image_parallel(
        mesh, apply_fn, apply_fn, params, ro, rd, 2.0, 6.0, s_det,
        block_size=32,
    )
    out_seq = render_image(
        apply_fn, apply_fn, params, ro, rd, 2.0, 6.0, s_det, block_size=32
    )
    assert out_par.fine.rgb.shape == (H, W, 3)
    np.testing.assert_allclose(
        np.asarray(out_par.fine.rgb), np.asarray(out_seq.fine.rgb), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_par.fine.depth),
        np.asarray(out_seq.fine.depth),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_par.coarse.rgb), np.asarray(out_seq.coarse.rgb),
        atol=1e-5,
    )


def test_validate_uses_mesh(tmp_path):
    """validate(..., mesh=) renders the frame across the mesh and returns
    the same metric surface as the single-device path."""
    from dexnerf_tpu.config import CfgNode
    from dexnerf_tpu.train import SceneData
    from dexnerf_tpu.train.loop import validate

    images, depths, poses, hwf = make_synthetic_scene(
        num_views=3, height=8, width=8
    )
    scene = SceneData(
        images=images, poses=poses, hwf=hwf,
        i_train=np.arange(2), i_val=np.array([2]), depths=depths,
    )
    cfg = CfgNode(
        {
            "dataset": {"type": "blender", "basedir": "", "near": 2.0,
                        "far": 6.0},
            "models": {
                "coarse": {"type": "FlexibleNeRFModel", "num_layers": 2,
                           "hidden_size": 16, "num_encoding_fn_xyz": ENC_XYZ,
                           "num_encoding_fn_dir": ENC_DIR},
            },
            "nerf": {
                "use_viewdirs": True,
                "validation": {"chunksize": 64, "perturb": False,
                               "num_coarse": 4, "num_fine": 4,
                               "white_background": False,
                               "radiance_field_noise_std": 0.0,
                               "lindisp": False},
            },
        }
    )
    apply_fn, params = _setup()
    mesh = make_mesh()
    v_mesh = validate(
        apply_fn, apply_fn, params, scene, cfg,
        dex=False, supervision="rgb", mesh=mesh,
    )
    v_single = validate(
        apply_fn, apply_fn, params, scene, cfg,
        dex=False, supervision="rgb",
    )
    assert np.isfinite(v_mesh["psnr"])
    np.testing.assert_allclose(v_mesh["rgb"], v_single["rgb"], atol=1e-5)
    np.testing.assert_allclose(
        v_mesh["depth"], v_single["depth"], atol=1e-5
    )


def test_parallel_train_step_with_fused_field():
    """The fused Pallas train field runs inside shard_map (per-device ray
    shards) — multi-chip + use_pallas composes."""
    from dexnerf_tpu.ops import make_fused_flexible_field_train

    mesh = make_mesh()
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
    images, _, poses, hwf = make_synthetic_scene(num_views=2, height=8, width=8)
    store = build_ray_store(images, poses, hwf, 2.0, 6.0)
    tx = make_optimizer(5e-3)
    state = init_train_state(params, tx)

    def fused():
        return make_fused_flexible_field_train(
            model, block_samples=32, block_samples_bwd=32, interpret=True
        )

    step = make_parallel_train_step(
        mesh, model.apply, model.apply, tx, SETTINGS, global_batch_size=16,
        coarse_field=fused(), fine_field=fused(),
    )
    key = jax.random.PRNGKey(1)
    for _ in range(2):
        key, sub = jax.random.split(key)
        state, metrics = step(state, store, sub)
    assert np.isfinite(float(metrics["loss"]))


def test_parallel_train_step_with_fused_loss():
    """The combined loss+gradients kernel runs inside shard_map (per-device
    ray shards) and matches the XLA parallel step's loss."""
    from dexnerf_tpu.ops import make_fused_train_loss

    mesh = make_mesh()
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
    images, _, poses, hwf = make_synthetic_scene(num_views=2, height=8, width=8)
    store = build_ray_store(images, poses, hwf, 2.0, 6.0)
    tx = make_optimizer(5e-3)

    fused = make_fused_train_loss(
        model, model, SETTINGS, block_samples=32, interpret=True
    )
    step_fused = make_parallel_train_step(
        mesh, model.apply, model.apply, tx, SETTINGS, global_batch_size=16,
        fused_loss=fused,
    )
    step_xla = make_parallel_train_step(
        mesh, model.apply, model.apply, tx, SETTINGS, global_batch_size=16,
    )
    st_f = init_train_state(jax.tree.map(jnp.copy, params), tx)
    st_x = init_train_state(jax.tree.map(jnp.copy, params), tx)
    key = jax.random.PRNGKey(1)
    for _ in range(2):
        key, sub = jax.random.split(key)
        st_f, mf = step_fused(st_f, store, sub)
        st_x, mx = step_xla(st_x, store, sub)
    np.testing.assert_allclose(
        float(mf["loss"]), float(mx["loss"]), rtol=1e-4
    )
