"""Import of reference-format PyTorch checkpoints into flax param trees.

Builds a torch ``state_dict`` with the reference's module naming
(``layer1``, ``layers_xyz.{i}``, ``fc_feat``, ``fc_alpha``,
``layers_dir.0``, ``fc_rgb`` — reference ``nerf/models.py:185-231``), saves
it through ``torch.save`` in the reference checkpoint schema
(``train_nerf_rgb.py:427-441``), imports it, and checks our flax model
reproduces the same forward pass as a direct numpy evaluation of those
weights.
"""

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
