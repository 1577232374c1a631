"""Real-data parity: render the reference's shipped pretrained checkpoints
through BOTH implementations and assert agreement.

This is the hard cross-implementation evidence for quality parity
(BASELINE.md north star): the same rays through (a) the reference's torch
code imported from ``/root/reference`` and (b) our JAX renderer with
``import_torch_checkpoint``-converted weights must produce near-identical
images (f32, deterministic validation path). See
``tools/reference_parity.py`` for the full 6-scene table
(docs/REFERENCE_PARITY.json: 92-120 dB).
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tools.reference_parity import PRETRAINED, compare_scene  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(PRETRAINED),
    reason="reference pretrained checkpoints not present",
)


@pytest.mark.parametrize("scene", ["lego-lowres", "hotdog-lowres"])
def test_pretrained_checkpoint_render_parity(scene):
    rec = compare_scene(scene, size=20)
    # ±0.1 dB parity bar needs ~40 dB agreement; we get >90 dB (f32-exact)
    assert rec["rgb_psnr_between_impls_db"] >= 40.0, rec
    assert rec["depth_mean_abs_diff_m"] < 1e-3, rec


def test_run_training_resumes_from_real_pretrained_ckpt(tmp_path):
    """--load-checkpoint with a REAL shipped checkpoint: the genuine torch
    Adam state_dict (tensor step counts, param-group ids) imports into the
    optax state and training continues from iter 199999."""
    import numpy as np

    from dexnerf_tpu.config import CfgNode
    from dexnerf_tpu.data import make_synthetic_scene
    from dexnerf_tpu.train import SceneData, run_training

    ckpt = os.path.join(
        PRETRAINED, "lego-lowres", "checkpoint199999.ckpt"
    )
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
                "id": "realresume", "logdir": str(tmp_path),
                "randomseed": 1, "train_iters": 200001,
                "validate_every": 0, "save_every": 0, "print_every": 1,
            },
            "dataset": {"type": "blender", "basedir": "", "near": 2.0,
                        "far": 6.0, "no_ndc": True},
            "models": {
                # the shipped ckpts are the reference DEFAULT architecture
                # (4x128, enc 10/4 — train_nerf_rgb.py:122-128)
                "coarse": {
                    "type": "FlexibleNeRFModel", "num_layers": 4,
                    "hidden_size": 128, "skip_connect_every": 4,
                    "num_encoding_fn_xyz": 10, "num_encoding_fn_dir": 4,
                },
                "fine": {
                    "type": "FlexibleNeRFModel", "num_layers": 4,
                    "hidden_size": 128, "skip_connect_every": 4,
                    "num_encoding_fn_xyz": 10, "num_encoding_fn_dir": 4,
                },
            },
            "optimizer": {"type": "Adam", "lr": 5.0e-3},
            "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
            "nerf": {
                "use_viewdirs": True,
                "train": {
                    "num_random_rays": 8, "chunksize": 64, "perturb": True,
                    "num_coarse": 4, "num_fine": 4,
                    "white_background": True,
                    "radiance_field_noise_std": 0.0, "lindisp": False,
                },
                "validation": {
                    "chunksize": 64, "perturb": False, "num_coarse": 4,
                    "num_fine": 4, "white_background": True,
                    "radiance_field_noise_std": 0.0, "lindisp": False,
                },
            },
        }
    )
    out = run_training(
        cfg, scene=scene, use_tensorboard=False, load_ckpt=ckpt
    )
    # resumed at the ckpt's iter (199999) and ran 2 steps to train_iters
    assert int(out["state"].step) == 200001
    assert np.isfinite(out["final_train_metrics"]["loss"])
