"""Train-step op-parity vs the reference's torch code (VERDICT r2 item 3).

One identical batch through one reference train step (imported read-only
from /root/reference) and ours: loss, every parameter gradient, and the
post-Adam parameters must agree to f32 tolerance. The full table lives in
docs/TRAIN_STEP_PARITY.json (tools/train_step_parity.py); this regression
runs a smaller batch so CI stays fast.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tools.train_step_parity import (  # noqa: E402
    _flax_tree_to_sd,
    load_reference_modules,
    our_train_step,
    reference_train_step,
)
from tools.reference_parity import REFERENCE_ROOT  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT),
    reason="reference source not present",
)


@pytest.fixture(scope="module")
def batch():
    import tools.train_step_parity as tsp

    load_reference_modules()
    from nerf import models as ref_models

    torch.manual_seed(7)
    kwargs = dict(
        num_layers=tsp.NUM_LAYERS, hidden_size=tsp.HIDDEN,
        skip_connect_every=tsp.SKIP, num_encoding_fn_xyz=tsp.ENC_XYZ,
        num_encoding_fn_dir=tsp.ENC_DIR, use_viewdirs=True,
    )
    sd_c = {k: v.detach().numpy().copy()
            for k, v in ref_models.FlexibleNeRFModel(**kwargs)
            .state_dict().items()}
    sd_f = {k: v.detach().numpy().copy()
            for k, v in ref_models.FlexibleNeRFModel(**kwargs)
            .state_dict().items()}
    rng = np.random.RandomState(3)
    n = 64
    ro = np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (n, 1))
    rd = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    rd[:, 2] = -1.0
    target = rng.rand(n, 3).astype(np.float32)
    ref_loss, ref_grads, ref_post = reference_train_step(
        sd_c, sd_f, ro, rd, target
    )
    return sd_c, sd_f, ro, rd, target, ref_loss, ref_grads, ref_post


@pytest.mark.parametrize("path", ["xla", "fused"])
def test_one_train_step_matches_reference(batch, path):
    sd_c, sd_f, ro, rd, target, ref_loss, ref_grads, ref_post = batch
    loss, grads, post = our_train_step(sd_c, sd_f, ro, rd, target, path=path)
    assert abs(loss - ref_loss) < 1e-5, (loss, ref_loss)
    g_ours = {
        **_flax_tree_to_sd(grads["coarse"], "coarse"),
        **_flax_tree_to_sd(grads["fine"], "fine"),
    }
    p_ours = {
        **_flax_tree_to_sd(post["coarse"], "coarse"),
        **_flax_tree_to_sd(post["fine"], "fine"),
    }
    for key in ref_grads:
        np.testing.assert_allclose(
            g_ours[key], ref_grads[key], atol=2e-4, rtol=0,
            err_msg=f"grad {key}",
        )
    # post-Adam params only where the gradient is determined: at count 1
    # Adam's update is ~lr*sign(g), so |g| ~ f32-noise entries legitimately
    # move by 2*lr in either implementation (see tools/train_step_parity.py)
    for key in ref_post:
        m = np.abs(ref_grads[key]) >= 1e-5
        if not m.any():
            continue
        np.testing.assert_allclose(
            p_ours[key][m], ref_post[key][m], atol=1e-3, rtol=0,
            err_msg=f"post-Adam {key}",
        )
