"""GT-depth supervision (depth_loss_weight > 0).

The datasets the reference targets carry per-pixel GT depth (messytable
``depthL.png``), but the reference only ever computed metrics from it
(``train_nerf_rgb.py:361-401``). Here the expected depth can be supervised
directly — the most Dex-NeRF-relevant training signal there is.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexnerf_tpu.core.encoding import encoding_dim
from dexnerf_tpu.data import build_ray_store, make_synthetic_scene, sample_ray_batch
from dexnerf_tpu.models import FlexibleNeRFModel
from dexnerf_tpu.render import RenderSettings
from dexnerf_tpu.train import init_train_state, make_optimizer, make_train_step
from dexnerf_tpu.train.step import masked_depth_mse

ENC_XYZ, ENC_DIR = 2, 1
SETTINGS = RenderSettings(
    num_coarse=8,
    num_fine=8,
    perturb=True,
    num_encoding_fn_xyz=ENC_XYZ,
    num_encoding_fn_dir=ENC_DIR,
)


def _setup(seed=0):
    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=16,
        num_encoding_fn_xyz=ENC_XYZ, num_encoding_fn_dir=ENC_DIR,
    )
    in_dim = encoding_dim(3, ENC_XYZ) + encoding_dim(3, ENC_DIR)
    key = jax.random.PRNGKey(seed)
    params = {
        "coarse": model.init(key, jnp.ones((1, in_dim))),
        "fine": model.init(jax.random.fold_in(key, 1), jnp.ones((1, in_dim))),
    }
    return model.apply, params


def _depth_store(num_views=3, hw=12):
    images, depths, poses, hwf = make_synthetic_scene(
        num_views=num_views, height=hw, width=hw
    )
    return build_ray_store(images, poses, hwf, 2.0, 6.0, depths=depths), depths


def test_store_carries_aligned_depth():
    store, depths = _depth_store()
    assert store.depth is not None
    np.testing.assert_array_equal(
        np.asarray(store.depth), depths.astype(np.float32).reshape(-1)
    )
    # gather alignment: sampled depth rows match the flattened source
    rays, target, d = sample_ray_batch(
        store, jax.random.PRNGKey(0), 16, return_depth=True
    )
    assert d.shape == (16,)
    flat = depths.reshape(-1)
    assert set(np.asarray(d).round(5)) <= set(flat.astype(np.float32).round(5))


def test_store_without_depth_raises_on_gather():
    store, _ = _depth_store()
    bare = build_ray_store(
        np.zeros((1, 4, 4, 3), np.float32),
        np.tile(np.eye(4, dtype=np.float32), (1, 1, 1)),
        [4, 4, 5.0], 2.0, 6.0,
    )
    with pytest.raises(ValueError, match="no"):
        sample_ray_batch(bare, jax.random.PRNGKey(0), 4, return_depth=True)


def test_masked_depth_mse():
    pred = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    gt = jnp.asarray([1.5, 0.0, 3.0, 9.0])  # 0 = missing GT
    # mask keeps gt>0: entries 0, 2, 3 -> errors 0.25, 0, 25
    np.testing.assert_allclose(
        float(masked_depth_mse(pred, gt)), (0.25 + 0.0 + 25.0) / 3, rtol=1e-6
    )
    # valid_max additionally drops entry 3
    np.testing.assert_allclose(
        float(masked_depth_mse(pred, gt, valid_max=5.0)), 0.25 / 2, rtol=1e-6
    )
    # all-masked: finite zero, not NaN
    assert float(masked_depth_mse(pred, jnp.zeros(4))) == 0.0


def test_depth_supervision_reduces_depth_error():
    """Same seed, same draws: training WITH the depth term ends with lower
    depth error on a held-out ray batch than without."""
    apply_fn, params = _setup()
    store, _ = _depth_store(num_views=4, hw=16)
    tx = make_optimizer(5e-3)

    def train(weight):
        step = make_train_step(
            apply_fn, apply_fn, tx, SETTINGS, 64,
            depth_loss_weight=weight,
        )
        # fresh buffers per run: the jitted step DONATES the state
        state = init_train_state(jax.tree.map(jnp.array, params), tx)
        key = jax.random.PRNGKey(3)
        for _ in range(60):
            key, sub = jax.random.split(key)
            state, metrics = step(state, store, sub)
        return state, metrics

    s_plain, m_plain = train(0.0)
    s_sup, m_sup = train(0.5)
    assert "depth_loss" not in m_plain
    assert np.isfinite(float(m_sup["depth_loss"]))

    # evaluate depth error on a fixed batch through the deterministic path
    from dexnerf_tpu.render import render_rays

    rays, _, d_gt = sample_ray_batch(
        store, jax.random.PRNGKey(99), 256, return_depth=True
    )

    def depth_err(state):
        out = render_rays(
            apply_fn, apply_fn, state.params, rays, None,
            SETTINGS.eval_variant(),
        )
        return float(jnp.mean(jnp.abs(out.fine.depth - d_gt)))

    assert depth_err(s_sup) < depth_err(s_plain)


def test_depth_weight_zero_is_trajectory_identical():
    apply_fn, params = _setup()
    store, _ = _depth_store()
    tx = make_optimizer(5e-3)
    s0 = make_train_step(apply_fn, apply_fn, tx, SETTINGS, 32)
    s1 = make_train_step(
        apply_fn, apply_fn, tx, SETTINGS, 32, depth_loss_weight=0.0
    )
    # fresh buffers per state: the jitted step DONATES the state
    a = init_train_state(jax.tree.map(jnp.array, params), tx)
    b = init_train_state(jax.tree.map(jnp.array, params), tx)
    key = jax.random.PRNGKey(5)
    a, ma = s0(a, store, key)
    b, mb = s1(b, store, key)
    assert float(ma["loss"]) == float(mb["loss"])
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(x, y), a.params, b.params
    )


def test_depth_supervision_rejects_fused_loss_and_pose():
    apply_fn, params = _setup()
    tx = make_optimizer(5e-3)
    with pytest.raises(ValueError, match="depth supervision"):
        make_train_step(
            apply_fn, apply_fn, tx, SETTINGS, 32,
            fused_loss=lambda *a: None, depth_loss_weight=1.0,
        )
    with pytest.raises(ValueError, match="mutually exclusive"):
        make_train_step(
            apply_fn, apply_fn, tx, SETTINGS, 32,
            ray_source=lambda *a: None, depth_loss_weight=1.0,
        )


def test_parallel_depth_supervision_descends():
    from dexnerf_tpu.parallel import make_mesh, make_parallel_train_step

    apply_fn, params = _setup()
    store, _ = _depth_store(num_views=2, hw=8)
    tx = make_optimizer(5e-3)
    state = init_train_state(params, tx)
    step = make_parallel_train_step(
        make_mesh(), apply_fn, apply_fn, tx, SETTINGS,
        global_batch_size=64, depth_loss_weight=0.5,
    )
    key = jax.random.PRNGKey(0)
    first = last = None
    for _ in range(20):
        key, sub = jax.random.split(key)
        state, metrics = step(state, store, sub)
        if first is None:
            first = float(metrics["depth_loss"])
        last = float(metrics["depth_loss"])
    assert np.isfinite(last) and last < first


def test_run_training_with_depth_loss(tmp_path):
    from dexnerf_tpu.config import CfgNode
    from dexnerf_tpu.train import SceneData, run_training

    images, depths, poses, hwf = make_synthetic_scene(
        num_views=3, height=8, width=8
    )
    scene = SceneData(
        images=images, poses=poses, hwf=hwf,
        i_train=np.array([0, 1]), i_val=np.array([2]), depths=depths,
    )
    cfg = CfgNode({
        "experiment": {
            "id": "depthsup", "logdir": str(tmp_path), "randomseed": 1,
            "train_iters": 2, "validate_every": 0, "save_every": 0,
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
            },
            "validation": {
                "chunksize": 64, "perturb": False, "num_coarse": 4,
                "num_fine": 4, "white_background": False,
                "radiance_field_noise_std": 0.0, "lindisp": False,
            },
        },
    })
    out = run_training(
        cfg, scene=scene, use_tensorboard=False, depth_loss_weight=0.5
    )
    assert np.isfinite(out["final_train_metrics"]["depth_loss"])

    # missing GT -> clear error
    scene_nod = SceneData(
        images=images, poses=poses, hwf=hwf,
        i_train=np.array([0, 1]), i_val=np.array([2]),
    )
    with pytest.raises(ValueError, match="no GT depth"):
        run_training(
            cfg, scene=scene_nod, use_tensorboard=False,
            depth_loss_weight=0.5,
        )


def test_depth_supervision_fused_kernel_step():
    """A depth-built fused loss kernel trains through make_train_step: the
    depth metric is reported and the TOTAL depth error descends (the depth
    cotangent is computed inside the kernel — ops/fused_train_loss)."""
    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.ops import make_fused_train_loss

    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=16,
        num_encoding_fn_xyz=ENC_XYZ, num_encoding_fn_dir=ENC_DIR,
    )
    apply_fn, params = _setup()
    store, _ = _depth_store(num_views=2, hw=8)
    tx = make_optimizer(5e-3)
    fused = make_fused_train_loss(
        model, model, SETTINGS, block_samples=64, interpret=True,
        depth_loss_weight=0.5,
    )
    step = make_train_step(
        apply_fn, apply_fn, tx, SETTINGS, 32,
        fused_loss=fused, depth_loss_weight=0.5,
    )
    state = init_train_state(params, tx)
    key = jax.random.PRNGKey(0)
    first = last = None
    for t in range(8):
        key, sub = jax.random.split(key)
        state, metrics = step(state, store, sub)
        assert "depth_loss" in metrics
        if first is None:
            first = float(metrics["depth_loss"])
        last = float(metrics["depth_loss"])
    assert np.isfinite(last) and last < first, (first, last)


def test_parallel_depth_supervision_fused_kernel():
    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.ops import make_fused_train_loss
    from dexnerf_tpu.parallel import make_mesh, make_parallel_train_step

    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=16,
        num_encoding_fn_xyz=ENC_XYZ, num_encoding_fn_dir=ENC_DIR,
    )
    apply_fn, params = _setup()
    store, _ = _depth_store(num_views=2, hw=8)
    tx = make_optimizer(5e-3)
    fused = make_fused_train_loss(
        model, model, SETTINGS, block_samples=32, interpret=True,
        depth_loss_weight=0.5,
    )
    step = make_parallel_train_step(
        make_mesh(), apply_fn, apply_fn, tx, SETTINGS,
        global_batch_size=64, fused_loss=fused, depth_loss_weight=0.5,
    )
    state = init_train_state(params, tx)
    state, metrics = step(state, store, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["depth_loss"]))
    assert np.isfinite(float(metrics["loss"]))


def test_depth_warmup_switches_supervision_on(tmp_path):
    """--depth-warmup N runs the first N iterations RGB-only (no
    depth_loss in metrics) then switches the supervised step in; the
    warmup step must not perturb the depth machinery (final metrics carry
    depth_loss). Round-5 stabilizer: depth supervision from iteration 0
    locks the white-background fog collapse in on some scenes."""
    from dexnerf_tpu.config import CfgNode
    from dexnerf_tpu.train import SceneData, run_training

    images, depths, poses, hwf = make_synthetic_scene(
        num_views=3, height=8, width=8
    )
    scene = SceneData(
        images=images, poses=poses, hwf=hwf,
        i_train=np.array([0, 1]), i_val=np.array([2]), depths=depths,
    )
    cfg = CfgNode({
        "experiment": {
            "id": "depthwarm", "logdir": str(tmp_path), "randomseed": 1,
            "train_iters": 4, "validate_every": 0, "save_every": 0,
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
        },
        "optimizer": {"type": "Adam", "lr": 5.0e-3},
        "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
        "nerf": {
            "use_viewdirs": True,
            "train": {
                "num_random_rays": 16, "chunksize": 64, "perturb": True,
                "num_coarse": 4, "num_fine": 0, "white_background": False,
                "radiance_field_noise_std": 0.0, "lindisp": False,
            },
            "validation": {
                "chunksize": 64, "perturb": False, "num_coarse": 4,
                "num_fine": 0, "white_background": False,
                "radiance_field_noise_std": 0.0, "lindisp": False,
            },
        },
    })
    out = run_training(
        cfg, scene=scene, use_tensorboard=False, depth_loss_weight=0.5,
        depth_warmup=2,
    )
    # after the switch, the supervised step's metrics carry depth_loss
    assert np.isfinite(out["final_train_metrics"]["depth_loss"])

    # warmup covering the whole run: final metrics are RGB-only
    out2 = run_training(
        cfg, scene=scene, use_tensorboard=False, depth_loss_weight=0.5,
        depth_warmup=10,
    )
    assert "depth_loss" not in out2["final_train_metrics"]


def test_depth_warmup_auto_switches_on_psnr(tmp_path):
    """depth_warmup=-1 (auto) stays RGB-only until train PSNR clears the
    fog threshold, then switches depth on; the switch step is recorded."""
    from dexnerf_tpu.config import CfgNode
    from dexnerf_tpu.train import SceneData, run_training

    images, depths, poses, hwf = make_synthetic_scene(
        num_views=3, height=8, width=8
    )
    scene = SceneData(
        images=images, poses=poses, hwf=hwf,
        i_train=np.array([0, 1]), i_val=np.array([2]), depths=depths,
    )

    def cfg(thresh):
        return CfgNode({
            "experiment": {
                "id": f"warmauto{thresh}", "logdir": str(tmp_path),
                "randomseed": 1, "train_iters": 4, "validate_every": 0,
                "save_every": 0, "print_every": 1,
            },
            "dataset": {"type": "blender", "basedir": "", "near": 2.0,
                        "far": 6.0, "no_ndc": True},
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
                    "depth_warmup_psnr": thresh,
                },
                "validation": {
                    "chunksize": 64, "perturb": False, "num_coarse": 4,
                    "num_fine": 0, "white_background": False,
                    "radiance_field_noise_std": 0.0, "lindisp": False,
                },
            },
        })

    # threshold below any real PSNR -> switches at the first print point
    out = run_training(
        cfg(-100.0), scene=scene, use_tensorboard=False,
        depth_loss_weight=0.5, depth_warmup=-1,
    )
    assert out["depth_on_step"] is not None
    assert np.isfinite(out["final_train_metrics"]["depth_loss"])

    # unreachable threshold -> never switches, run stays RGB-only
    out2 = run_training(
        cfg(1000.0), scene=scene, use_tensorboard=False,
        depth_loss_weight=0.5, depth_warmup=-1,
    )
    assert out2["depth_on_step"] is None
    assert "depth_loss" not in out2["final_train_metrics"]
