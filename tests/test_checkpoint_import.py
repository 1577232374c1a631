"""Import of reference-format PyTorch checkpoints into flax param trees.

Builds a torch ``state_dict`` with the reference's module naming
(``layer1``, ``layers_xyz.{i}``, ``fc_feat``, ``fc_alpha``,
``layers_dir.0``, ``fc_rgb`` — reference ``nerf/models.py:185-231``), saves
it through ``torch.save`` in the reference checkpoint schema
(``train_nerf_rgb.py:427-441``), imports it, and checks our flax model
reproduces the same forward pass as a direct numpy evaluation of those
weights.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from dexnerf_tpu.core.encoding import encoding_dim
from dexnerf_tpu.models import FlexibleNeRFModel
from dexnerf_tpu.train import import_torch_checkpoint

HID = 32
DIM_XYZ = encoding_dim(3, 4)  # 27
DIM_DIR = encoding_dim(3, 2)  # 15
NUM_LAYERS = 4  # layer1 + 3 trunk, no skip triggers (skip_every=4)


def _random_state_dict(rng):
    def lin(i, o):
        return (
            torch.tensor(rng.randn(o, i).astype(np.float32)),
            torch.tensor(rng.randn(o).astype(np.float32)),
        )

    sd = {}
    w, b = lin(DIM_XYZ, HID)
    sd["layer1.weight"], sd["layer1.bias"] = w, b
    for i in range(NUM_LAYERS - 1):
        w, b = lin(HID, HID)
        sd[f"layers_xyz.{i}.weight"], sd[f"layers_xyz.{i}.bias"] = w, b
    w, b = lin(HID, HID)
    sd["fc_feat.weight"], sd["fc_feat.bias"] = w, b
    w, b = lin(HID, 1)
    sd["fc_alpha.weight"], sd["fc_alpha.bias"] = w, b
    w, b = lin(HID + DIM_DIR, HID // 2)
    sd["layers_dir.0.weight"], sd["layers_dir.0.bias"] = w, b
    w, b = lin(HID // 2, 3)
    sd["fc_rgb.weight"], sd["fc_rgb.bias"] = w, b
    return sd


def _numpy_forward(sd, x):
    """Independent numpy evaluation of the reference architecture."""
    def lin(name, h):
        W = sd[f"{name}.weight"].numpy()
        b = sd[f"{name}.bias"].numpy()
        return h @ W.T + b

    relu = lambda v: np.maximum(v, 0)
    xyz, view = x[..., :DIM_XYZ], x[..., DIM_XYZ:]
    h = lin("layer1", xyz)  # no activation (reference models.py:238)
    for i in range(NUM_LAYERS - 1):
        h = relu(lin(f"layers_xyz.{i}", h))
    feat = relu(lin("fc_feat", h))
    alpha = lin("fc_alpha", h)
    y = np.concatenate([feat, view], -1)
    y = relu(lin("layers_dir.0", y))
    rgb = lin("fc_rgb", y)
    return np.concatenate([rgb, alpha], -1)


def test_import_torch_checkpoint_forward_parity(tmp_path):
    rng = np.random.RandomState(0)
    sd_coarse = _random_state_dict(rng)
    sd_fine = _random_state_dict(rng)
    ckpt_path = str(tmp_path / "checkpoint00100.ckpt")
    torch.save(
        {
            "iter": 100,
            "model_coarse_state_dict": sd_coarse,
            "model_fine_state_dict": sd_fine,
            "optimizer_state_dict": {},
            "loss": 0.5,
            "psnr": 20.0,
        },
        ckpt_path,
    )

    imported = import_torch_checkpoint(ckpt_path)
    assert imported["step"] == 100
    assert imported["fine"] is not None

    model = FlexibleNeRFModel(
        num_layers=NUM_LAYERS,
        hidden_size=HID,
        skip_connect_every=4,
        num_encoding_fn_xyz=4,
        num_encoding_fn_dir=2,
    )
    x = rng.randn(16, DIM_XYZ + DIM_DIR).astype(np.float32)
    got = np.asarray(model.apply(imported["coarse"], jnp.asarray(x)))
    ref = _numpy_forward(sd_coarse, x)
    np.testing.assert_allclose(got, ref, rtol=1e-3)
    got_f = np.asarray(model.apply(imported["fine"], jnp.asarray(x)))
    ref_f = _numpy_forward(sd_fine, x)
    np.testing.assert_allclose(got_f, ref_f, rtol=1e-3)


def test_import_no_fine_model(tmp_path):
    rng = np.random.RandomState(1)
    ckpt_path = str(tmp_path / "c.ckpt")
    torch.save(
        {
            "iter": 5,
            "model_coarse_state_dict": _random_state_dict(rng),
            "model_fine_state_dict": None,
            "optimizer_state_dict": {},
            "loss": 1.0,
            "psnr": 10.0,
            "height": 400,
            "width": 400,
            "focal_length": 555.0,
        },
        ckpt_path,
    )
    imported = import_torch_checkpoint(ckpt_path)
    assert imported["fine"] is None
    assert imported["height"] == 400


def _fake_adam_state(sds, rng, step=100):
    """Fabricate a torch Adam ``state_dict()`` over the concatenated param
    list of the given model state_dicts (the reference builds its optimizer
    over coarse params then fine params, ``train_nerf_rgb.py:143-148``)."""
    params = [p for sd in sds for p in sd.values()]
    state = {
        i: {
            "step": torch.tensor(float(step)),
            "exp_avg": torch.tensor(
                rng.randn(*p.shape).astype(np.float32)
            ),
            "exp_avg_sq": torch.tensor(
                np.abs(rng.randn(*p.shape)).astype(np.float32)
            ),
        }
        for i, p in enumerate(params)
    }
    return {
        "state": state,
        "param_groups": [
            {"params": list(range(len(params))), "lr": 5e-3,
             "betas": (0.9, 0.999), "eps": 1e-8}
        ],
    }


def _full_ckpt(tmp_path, rng, step=100):
    sd_coarse = _random_state_dict(rng)
    sd_fine = _random_state_dict(rng)
    opt_sd = _fake_adam_state([sd_coarse, sd_fine], rng, step=step)
    path = str(tmp_path / f"checkpoint{step:05d}.ckpt")
    torch.save(
        {
            "iter": step,
            "model_coarse_state_dict": sd_coarse,
            "model_fine_state_dict": sd_fine,
            "optimizer_state_dict": opt_sd,
            "loss": 0.5,
            "psnr": 20.0,
        },
        path,
    )
    return path, sd_coarse, sd_fine, opt_sd


def test_optimizer_moments_import(tmp_path):
    """Adam exp_avg/exp_avg_sq transfer into the optax opt_state (transposed
    like the weights), with the checkpoint iter as the count."""
    import jax
    import optax

    from dexnerf_tpu.train.checkpoints import (
        build_opt_state_from_torch,
        import_torch_checkpoint,
    )

    rng = np.random.RandomState(3)
    path, sd_coarse, _, opt_sd = _full_ckpt(tmp_path, rng, step=77)
    imported = import_torch_checkpoint(path)
    params = {"coarse": imported["coarse"], "fine": imported["fine"]}
    tx = optax.adam(learning_rate=optax.constant_schedule(5e-3))
    opt_state = build_opt_state_from_torch(imported, params, tx)

    adam_states = [
        s for s in jax.tree.leaves(
            opt_state,
            is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState),
        )
        if isinstance(s, optax.ScaleByAdamState)
    ]
    assert len(adam_states) == 1
    st = adam_states[0]
    assert int(st.count) == 77
    # torch param 0 is layer1.weight [out, in] -> our Dense_0 kernel [in, out]
    np.testing.assert_allclose(
        np.asarray(st.mu["coarse"]["params"]["Dense_0"]["kernel"]),
        opt_sd["state"][0]["exp_avg"].numpy().T,
        rtol=1e-6,
    )
    # fine model moments land under "fine" (offset by the coarse param count)
    n_coarse = len(sd_coarse)
    np.testing.assert_allclose(
        np.asarray(st.nu["fine"]["params"]["Dense_0"]["bias"]),
        opt_sd["state"][n_coarse + 1]["exp_avg_sq"].numpy(),
        rtol=1e-6,
    )


def test_optimizer_moments_import_extra_param_group(tmp_path):
    """Param groups the torch checkpoint cannot carry (e.g. the sg_ir
    shading subtree) get fresh zero moments, while coarse/fine moments
    still transfer (resuming --sg-ir from a reference checkpoint)."""
    import jax
    import optax

    from dexnerf_tpu.render.sg_ir import init_sg_ir_params
    from dexnerf_tpu.train.checkpoints import (
        build_opt_state_from_torch,
        import_torch_checkpoint,
    )

    rng = np.random.RandomState(9)
    path, _, _, opt_sd = _full_ckpt(tmp_path, rng, step=12)
    imported = import_torch_checkpoint(path)
    params = {
        "coarse": imported["coarse"],
        "fine": imported["fine"],
        "sg": init_sg_ir_params(jax.random.PRNGKey(0)),
    }
    tx = optax.adam(learning_rate=optax.constant_schedule(5e-3))
    opt_state = build_opt_state_from_torch(imported, params, tx)
    st = [
        s for s in jax.tree.leaves(
            opt_state,
            is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState),
        )
        if isinstance(s, optax.ScaleByAdamState)
    ][0]
    for leaf in jax.tree.leaves(st.mu["sg"]) + jax.tree.leaves(st.nu["sg"]):
        assert not np.any(np.asarray(leaf))
    np.testing.assert_allclose(
        np.asarray(st.mu["coarse"]["params"]["Dense_0"]["kernel"]),
        opt_sd["state"][0]["exp_avg"].numpy().T,
        rtol=1e-6,
    )


def test_run_training_resumes_from_reference_ckpt(tmp_path):
    """--load-checkpoint foo.ckpt through run_training: params + optimizer
    moments + start_iter all restored (reference train_nerf_rgb.py:168-174)."""
    from dexnerf_tpu.config import CfgNode
    from dexnerf_tpu.data import make_synthetic_scene
    from dexnerf_tpu.train import SceneData, run_training

    rng = np.random.RandomState(4)
    path, sd_coarse, _, _ = _full_ckpt(tmp_path, rng, step=100)

    images, depths, poses, hwf = make_synthetic_scene(
        num_views=3, height=8, width=8
    )
    scene = SceneData(
        images=images, poses=poses, hwf=hwf,
        i_train=np.arange(2), i_val=np.array([2]), depths=depths,
    )
    cfg = CfgNode(
        {
            "experiment": {
                "id": "ckptresume", "logdir": str(tmp_path), "randomseed": 1,
                "train_iters": 102, "validate_every": 0, "save_every": 0,
                "print_every": 1,
            },
            "dataset": {"type": "blender", "basedir": "", "near": 2.0,
                        "far": 6.0, "no_ndc": True},
            "models": {
                "coarse": {
                    "type": "FlexibleNeRFModel", "num_layers": NUM_LAYERS,
                    "hidden_size": HID, "skip_connect_every": 4,
                    "num_encoding_fn_xyz": 4, "num_encoding_fn_dir": 2,
                },
                "fine": {
                    "type": "FlexibleNeRFModel", "num_layers": NUM_LAYERS,
                    "hidden_size": HID, "skip_connect_every": 4,
                    "num_encoding_fn_xyz": 4, "num_encoding_fn_dir": 2,
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
        }
    )
    out = run_training(
        cfg, scene=scene, use_tensorboard=False, load_ckpt=path
    )
    # resumed at iter 100, ran 2 steps to 102
    assert int(out["state"].step) == 102
    assert np.isfinite(out["final_train_metrics"]["loss"])
    # params actually came from the ckpt: after only 2 small-lr steps the
    # coarse layer1 kernel must still be close to the imported weights
    got = np.asarray(
        out["state"].params["coarse"]["params"]["Dense_0"]["kernel"]
    )
    want = sd_coarse["layer1.weight"].numpy().T
    assert np.max(np.abs(got - want)) < 0.1


def test_export_loads_into_real_torch_model_and_steps(tmp_path):
    """The exported .ckpt must drive the REFERENCE stack: state_dicts load
    into the reference's own FlexibleNeRFModel, and the exported Adam state
    load_state_dicts into a real torch.optim.Adam and survives a step().

    torch assigns optimizer state positionally over ``parameters()`` order
    (layer1, layers_xyz.*, layers_dir.0, fc_alpha, fc_rgb, fc_feat —
    registration order, reference nerf/models.py:207-228), which differs
    from our forward-call head order; a mis-ordered export produces
    shape-mismatched moments that only a real optimizer.step() catches.
    """
    import jax

    from tools.reference_parity import REFERENCE_ROOT, load_reference_modules
    from dexnerf_tpu.train import make_optimizer
    from dexnerf_tpu.train.checkpoints import export_torch_checkpoint

    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference source not present")
    refnerf = load_reference_modules()

    model = FlexibleNeRFModel(
        num_layers=NUM_LAYERS, hidden_size=HID, skip_connect_every=4,
        num_encoding_fn_xyz=4, num_encoding_fn_dir=2,
    )
    key = jax.random.PRNGKey(11)
    dummy = jnp.ones((1, DIM_XYZ + DIM_DIR))
    params = {
        "coarse": model.init(key, dummy),
        "fine": model.init(jax.random.fold_in(key, 1), dummy),
    }
    tx = make_optimizer(5e-3)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    _, opt_state = tx.update(grads, opt_state, params)

    path = str(tmp_path / "export.ckpt")
    export_torch_checkpoint(path, params, step=50, opt_state=opt_state)

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    tmodels = []
    for sel in ("coarse", "fine"):
        tm = refnerf.models.FlexibleNeRFModel(
            num_layers=NUM_LAYERS, hidden_size=HID, skip_connect_every=4,
            num_encoding_fn_xyz=4, num_encoding_fn_dir=2,
        )
        missing = tm.load_state_dict(ckpt[f"model_{sel}_state_dict"])
        assert not missing.missing_keys and not missing.unexpected_keys
        tmodels.append(tm)

    trainable = [p for tm in tmodels for p in tm.parameters()]
    opt = torch.optim.Adam(trainable, lr=5e-3)
    opt.load_state_dict(ckpt["optimizer_state_dict"])
    # every positional moment must match its parameter's shape — this is
    # what a wrong index order breaks
    for i, p in enumerate(trainable):
        st = opt.state[p]
        assert tuple(st["exp_avg"].shape) == tuple(p.shape), (i, p.shape)
    # moments must be the ONE-grad-step Adam moments for the right leaf:
    # every exp_avg is (1-beta1)*1 = 0.1 after the single unit-grad update
    for p in trainable:
        np.testing.assert_allclose(
            opt.state[p]["exp_avg"].numpy(), 0.1, rtol=1e-5
        )
    loss = sum((tm(torch.ones(2, DIM_XYZ + DIM_DIR)) ** 2).mean()
               for tm in tmodels)
    loss.backward()
    opt.step()  # crashes on shape-mismatched moments


def test_export_torch_checkpoint_roundtrip(tmp_path):
    """export -> import reproduces params, step, and Adam moments."""
    import jax
    import optax

    from dexnerf_tpu.train import make_optimizer
    from dexnerf_tpu.train.checkpoints import (
        build_opt_state_from_torch,
        export_torch_checkpoint,
    )

    model = FlexibleNeRFModel(
        num_layers=NUM_LAYERS, hidden_size=HID, skip_connect_every=4,
        num_encoding_fn_xyz=4, num_encoding_fn_dir=2,
    )
    key = jax.random.PRNGKey(3)
    dummy = jnp.ones((1, DIM_XYZ + DIM_DIR))
    params = {
        "coarse": model.init(key, dummy),
        "fine": model.init(jax.random.fold_in(key, 1), dummy),
    }
    tx = make_optimizer(5e-3)
    opt_state = tx.init(params)
    # make the moments nonzero so the roundtrip is meaningful
    grads = jax.tree.map(jnp.ones_like, params)
    _, opt_state = tx.update(grads, opt_state, params)

    path = str(tmp_path / "export.ckpt")
    export_torch_checkpoint(
        path, params, step=1234, opt_state=opt_state,
        hwf=(25, 25, 20.0),
    )

    imported = import_torch_checkpoint(path)
    assert imported["step"] == 1234
    assert imported["height"] == 25 and imported["focal_length"] == 20.0
    for sel in ("coarse", "fine"):
        got = imported[sel]["params"]
        want = (
            params[sel]["params"] if "params" in params[sel] else params[sel]
        )
        for name in want:
            np.testing.assert_allclose(
                got[name]["kernel"], np.asarray(want[name]["kernel"]),
                rtol=0, atol=0,
            )
            np.testing.assert_allclose(
                got[name]["bias"], np.asarray(want[name]["bias"]),
                rtol=0, atol=0,
            )

    restored = build_opt_state_from_torch(imported, params, tx)

    def adam(s):
        found = []
        jax.tree.map(
            lambda n: found.append(n)
            if isinstance(n, optax.ScaleByAdamState)
            else None,
            s,
            is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState),
        )
        return found[0]

    a0, a1 = adam(opt_state), adam(restored)
    flat0 = jax.tree.leaves(a0.mu) + jax.tree.leaves(a0.nu)
    flat1 = jax.tree.leaves(a1.mu) + jax.tree.leaves(a1.nu)
    assert len(flat0) == len(flat1)
    for x, y in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0)


def test_run_training_pose_opt_resumes_from_reference_ckpt(tmp_path):
    """Reference-.ckpt resume (with Adam moments) under --pose-opt: the
    imported moments must graft into the PARTITIONED (multi_transform)
    optimizer state without breaking the masked structure, and the first
    updates must run (regression: a dense replacement crashed tx.update)."""
    from dexnerf_tpu.config import CfgNode
    from dexnerf_tpu.data import make_synthetic_scene
    from dexnerf_tpu.train import SceneData, run_training

    rng = np.random.RandomState(9)
    path, sd_coarse, _, _ = _full_ckpt(tmp_path, rng, step=100)

    images, depths, poses, hwf = make_synthetic_scene(
        num_views=3, height=8, width=8
    )
    scene = SceneData(
        images=images, poses=poses, hwf=hwf,
        i_train=np.arange(2), i_val=np.array([2]), depths=depths,
    )
    cfg = CfgNode(
        {
            "experiment": {
                "id": "poseresume", "logdir": str(tmp_path), "randomseed": 1,
                "train_iters": 102, "validate_every": 0, "save_every": 0,
                "print_every": 1,
            },
            "dataset": {"type": "blender", "basedir": "", "near": 2.0,
                        "far": 6.0, "no_ndc": True},
            "models": {
                "coarse": {
                    "type": "FlexibleNeRFModel", "num_layers": NUM_LAYERS,
                    "hidden_size": HID, "skip_connect_every": 4,
                    "num_encoding_fn_xyz": 4, "num_encoding_fn_dir": 2,
                },
                "fine": {
                    "type": "FlexibleNeRFModel", "num_layers": NUM_LAYERS,
                    "hidden_size": HID, "skip_connect_every": 4,
                    "num_encoding_fn_xyz": 4, "num_encoding_fn_dir": 2,
                },
            },
            "optimizer": {"type": "Adam", "lr": 5.0e-3, "pose_lr": 1.0e-3},
            "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
            "nerf": {
                "use_viewdirs": True,
                "train": {
                    "num_random_rays": 16, "chunksize": 64, "perturb": True,
                    "num_coarse": 4, "num_fine": 4, "white_background": False,
                    "radiance_field_noise_std": 0.0, "lindisp": False,
                    "pose_opt": True,
                },
                "validation": {
                    "chunksize": 64, "perturb": False, "num_coarse": 4,
                    "num_fine": 4, "white_background": False,
                    "radiance_field_noise_std": 0.0, "lindisp": False,
                },
            },
        }
    )
    out = run_training(
        cfg, scene=scene, use_tensorboard=False, load_ckpt=path
    )
    assert int(out["state"].step) == 102
    assert np.isfinite(out["final_train_metrics"]["loss"])
    # the imported weights survived and the pose twists trained from zero
    got = np.asarray(
        out["state"].params["coarse"]["params"]["Dense_0"]["kernel"]
    )
    want = sd_coarse["layer1.weight"].numpy().T
    assert np.max(np.abs(got - want)) < 0.2
    assert out["final_train_metrics"]["pose_twist_norm"] > 0.0


def test_export_pose_opt_checkpoint(tmp_path):
    """apps.export on a --pose-opt checkpoint: the raw-probe template
    rebuild restores the partitioned state, and the torch .ckpt carries
    the MODEL partition's Adam moments (not the pose twists)."""
    from dexnerf_tpu.apps.export import main as export_main
    from dexnerf_tpu.config import CfgNode
    from dexnerf_tpu.data import make_synthetic_scene
    from dexnerf_tpu.train import SceneData, run_training

    images, depths, poses, hwf = make_synthetic_scene(
        num_views=3, height=8, width=8
    )
    scene = SceneData(
        images=images, poses=poses, hwf=hwf,
        i_train=np.arange(2), i_val=np.array([2]), depths=depths,
    )
    cfg_dict = {
        "experiment": {
            "id": "poseexp", "logdir": str(tmp_path), "randomseed": 1,
            "train_iters": 2, "validate_every": 0, "save_every": 2,
            "print_every": 1,
        },
        "dataset": {"type": "blender", "basedir": "", "near": 2.0,
                    "far": 6.0, "no_ndc": True},
        "models": {
            "coarse": {
                "type": "FlexibleNeRFModel", "num_layers": NUM_LAYERS,
                "hidden_size": HID, "skip_connect_every": 4,
                "num_encoding_fn_xyz": 4, "num_encoding_fn_dir": 2,
            },
            "fine": {
                "type": "FlexibleNeRFModel", "num_layers": NUM_LAYERS,
                "hidden_size": HID, "skip_connect_every": 4,
                "num_encoding_fn_xyz": 4, "num_encoding_fn_dir": 2,
            },
        },
        "optimizer": {"type": "Adam", "lr": 5.0e-3, "pose_lr": 1.0e-3},
        "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
        "nerf": {
            "use_viewdirs": True,
            "train": {
                "num_random_rays": 16, "chunksize": 64, "perturb": True,
                "num_coarse": 4, "num_fine": 4, "white_background": False,
                "radiance_field_noise_std": 0.0, "lindisp": False,
                "pose_opt": True,
            },
            "validation": {
                "chunksize": 64, "perturb": False, "num_coarse": 4,
                "num_fine": 4, "white_background": False,
                "radiance_field_noise_std": 0.0, "lindisp": False,
            },
        },
    }
    out = run_training(
        CfgNode(cfg_dict), scene=scene, use_tensorboard=False
    )
    assert "pose" in out["state"].params

    import yaml

    cfgpath = str(tmp_path / "cfg.yml")
    with open(cfgpath, "w") as f:
        yaml.safe_dump(cfg_dict, f)
    outpath = str(tmp_path / "export.ckpt")
    rc = export_main(
        [
            "--config", cfgpath,
            "--checkpoint", str(tmp_path / "poseexp" / "checkpoints"),
            "--out", outpath,
        ]
    )
    assert rc == 0
    ck = torch.load(outpath, map_location="cpu", weights_only=False)
    assert "model_coarse_state_dict" in ck
    assert "optimizer_state_dict" in ck
    # moments exported from the MODEL partition, torch index-keyed
    assert len(ck["optimizer_state_dict"]["state"]) > 0


# ---------------------------------------------------------------------------
# Architecture inference: the checkpoint is the truth
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "num_layers,hidden,skip,use_viewdirs",
    [
        (4, 32, 4, True),    # the reference's silent defaults: no skip fires
        (8, 64, 4, True),    # the paper shape: skip at trunk position 4
        (6, 16, 2, True),    # multiple skips (trunk 2 and... 2 only; 4=last-1)
        (4, 32, 4, False),   # no-viewdirs head
        (9, 16, 3, True),    # skips at 3 and 6
    ],
)
def test_infer_flexible_arch_roundtrip(num_layers, hidden, skip, use_viewdirs):
    """infer_flexible_arch reconstructs an architecture whose param tree is
    shape-identical to the one it was read from."""
    import jax

    from dexnerf_tpu.train.checkpoints import infer_flexible_arch

    def shapes(m):
        x = jnp.zeros((1, DIM_XYZ + (DIM_DIR if use_viewdirs else 0)))
        tree = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x))
        return jax.tree.map(lambda a: a.shape, tree)

    kw = dict(
        num_encoding_fn_xyz=4, num_encoding_fn_dir=2,
        use_viewdirs=use_viewdirs,
    )
    src = FlexibleNeRFModel(
        num_layers=num_layers, hidden_size=hidden,
        skip_connect_every=skip, **kw,
    )
    params = src.init(
        jnp.asarray(np.zeros(2, np.uint32)),
        jnp.zeros((1, DIM_XYZ + (DIM_DIR if use_viewdirs else 0))),
    )
    arch = infer_flexible_arch(params, use_viewdirs)
    assert arch["num_layers"] == num_layers
    assert arch["hidden_size"] == hidden
    rebuilt = FlexibleNeRFModel(**arch, **kw)
    assert shapes(rebuilt) == shapes(src)


def test_align_cfg_models_to_pretrained_quirk(tmp_path):
    """A reference pretrained dir's config declares 8x256 but its checkpoint
    holds the constructor defaults (the reference DROPS those config knobs,
    train_nerf_rgb.py:122-128). Loading must trust the weights: after
    align_cfg_models_to_checkpoint, config-built apply fns accept the
    imported params."""
    import warnings

    import yaml

    from dexnerf_tpu.config import load_config
    from dexnerf_tpu.train.loop import (
        align_cfg_models_to_checkpoint,
        setup_models,
    )

    rng = np.random.RandomState(3)
    ckpt_path = str(tmp_path / "checkpoint00100.ckpt")
    torch.save(
        {
            "iter": 100,
            "model_coarse_state_dict": _random_state_dict(rng),
            "model_fine_state_dict": _random_state_dict(rng),
            "optimizer_state_dict": {},
            "loss": 0.5,
            "psnr": 20.0,
        },
        ckpt_path,
    )
    # config declares the PAPER architecture, like every shipped
    # pretrained/*/config.yml — the weights above are 4 x HID(32)
    model_blk = {
        "type": "FlexibleNeRFModel", "num_layers": 8, "hidden_size": 256,
        "skip_connect_every": 4, "num_encoding_fn_xyz": 4,
        "num_encoding_fn_dir": 2, "use_viewdirs": True,
    }
    cfg_dict = {
        "experiment": {"id": "e", "logdir": str(tmp_path), "randomseed": 1,
                       "train_iters": 1, "validate_every": 1,
                       "save_every": 1, "print_every": 1},
        "dataset": {"type": "blender", "basedir": "none", "near": 2.0,
                    "far": 6.0, "no_ndc": True},
        "models": {"coarse": dict(model_blk), "fine": dict(model_blk)},
        "optimizer": {"type": "Adam", "lr": 5.0e-3},
        "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
        "nerf": {
            "use_viewdirs": True,
            "train": {"num_random_rays": 8, "chunksize": 64, "perturb": True,
                      "num_coarse": 4, "num_fine": 4,
                      "white_background": False,
                      "radiance_field_noise_std": 0.0, "lindisp": False},
            "validation": {"chunksize": 64, "perturb": False,
                           "num_coarse": 4, "num_fine": 4,
                           "white_background": False,
                           "radiance_field_noise_std": 0.0,
                           "lindisp": False},
        },
    }
    cfgpath = str(tmp_path / "cfg.yml")
    with open(cfgpath, "w") as f:
        yaml.safe_dump(cfg_dict, f)
    cfg = load_config(cfgpath)

    imported = import_torch_checkpoint(ckpt_path)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = align_cfg_models_to_checkpoint(cfg, imported)
    assert any("overrides the config" in str(x.message) for x in w)
    assert int(cfg.models.coarse.num_layers) == NUM_LAYERS
    assert int(cfg.models.coarse.hidden_size) == HID
    assert int(cfg.models.fine.hidden_size) == HID

    coarse_fn, fine_fn, _ = setup_models(cfg, 1)
    x = jnp.zeros((4, DIM_XYZ + DIM_DIR))
    out = coarse_fn(imported["coarse"], x)       # no ScopeParamShapeError
    assert out.shape == (4, 4)
    out_f = fine_fn(imported["fine"], x)
    assert out_f.shape == (4, 4)

    # a MATCHING config is left untouched and warns nothing
    cfg2 = load_config(cfgpath)
    cfg2.models.coarse.num_layers = NUM_LAYERS
    cfg2.models.coarse.hidden_size = HID
    cfg2.models.fine.num_layers = NUM_LAYERS
    cfg2.models.fine.hidden_size = HID
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        align_cfg_models_to_checkpoint(cfg2, imported)
    assert not any("overrides the config" in str(x.message) for x in w2)
