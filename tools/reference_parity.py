"""Cross-implementation parity vs the reference's shipped pretrained ckpts.

Loads the real ``pretrained/<scene>/checkpoint*.ckpt`` weights
(reference artifacts, SURVEY.md §6), renders the SAME camera pose with

* (a) the reference's own PyTorch code, imported from ``/root/reference``
  (``nerf/train_utils.py::run_one_iter_of_nerf`` in validation mode), and
* (b) this framework's JAX renderer via ``import_torch_checkpoint``,

and reports the PSNR between the two renders plus depth agreement. This is
the hard evidence that our rendering math matches the reference on real
converged scenes, with zero dataset downloads (``eval_nerf.py:116-207``,
``nerf/models.py:185-256``, ``nerf/volume_rendering_utils.py:6-70``).

The reference imports ``torchsearchsorted`` (a CUDA extension that is not
installed); modern torch ships the identical op, so a stub module is
injected before import.

Usage:
    python tools/reference_parity.py [--scenes lego-lowres,chair-lowres]
                                     [--size 32] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference/nerf-pytorch"
PRETRAINED = os.path.join(REFERENCE_ROOT, "pretrained")

# blender synthetic camera_angle_x (transforms_*.json, all synthetic scenes)
BLENDER_CAMERA_ANGLE_X = 0.6911112070083618


def _install_torchsearchsorted_stub():
    """The reference hard-imports the torchsearchsorted CUDA extension
    (``nerf_helpers.py:6``); torch >= 1.6 provides the same op natively."""
    if "torchsearchsorted" in sys.modules:
        return
    import torch

    mod = types.ModuleType("torchsearchsorted")

    def searchsorted(sorted_sequence, values, side="right"):
        return torch.searchsorted(
            sorted_sequence.contiguous(),
            values.contiguous(),
            right=(side == "right"),
        )

    mod.searchsorted = searchsorted
    sys.modules["torchsearchsorted"] = mod


def load_reference_modules():
    """Import the reference package (read-only, for cross-validation)."""
    _install_torchsearchsorted_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import nerf as refnerf  # noqa: F401

    return refnerf


def _pose_spherical_c2w(theta_deg: float, phi_deg: float, radius: float):
    """Blender-convention spherical camera pose (c2w), matching the pose
    family of ``load_blender.py:33-38`` (translate → rotate phi → rotate
    theta → axis flip)."""
    t = np.eye(4, dtype=np.float32)
    t[2, 3] = radius
    phi = np.deg2rad(phi_deg)
    rp = np.array(
        [
            [1, 0, 0, 0],
            [0, np.cos(phi), -np.sin(phi), 0],
            [0, np.sin(phi), np.cos(phi), 0],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )
    th = np.deg2rad(theta_deg)
    rt = np.array(
        [
            [np.cos(th), 0, -np.sin(th), 0],
            [0, 1, 0, 0],
            [np.sin(th), 0, np.cos(th), 0],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )
    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
        dtype=np.float32,
    )
    return flip @ rt @ rp @ t


def latest_ckpt(scene: str) -> str:
    d = os.path.join(PRETRAINED, scene)
    cands = sorted(f for f in os.listdir(d) if f.endswith(".ckpt"))
    if not cands:
        raise FileNotFoundError(f"no .ckpt under {d}")
    return os.path.join(d, cands[-1])


def reference_render(ckpt_path: str, cfg_path: str, ro, rd, hwf):
    """Render (ro, rd) through the reference's own torch code."""
    import torch
    import yaml

    refnerf = load_reference_modules()
    from nerf import models as ref_models
    from nerf.cfgnode import CfgNode as RefCfgNode
    from nerf.nerf_helpers import get_embedding_function
    from nerf.train_utils import run_one_iter_of_nerf

    with open(cfg_path) as f:
        cfg = RefCfgNode(yaml.safe_load(f))

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    # The reference entry scripts pass ONLY encoding kwargs, so the shipped
    # models are FlexibleNeRFModel defaults (4 layers, 128 hidden, no skip)
    # regardless of the config's num_layers/hidden_size
    # (train_nerf_rgb.py:122-140).
    kwargs = dict(
        num_encoding_fn_xyz=cfg.models.coarse.num_encoding_fn_xyz,
        num_encoding_fn_dir=cfg.models.coarse.num_encoding_fn_dir,
        include_input_xyz=cfg.models.coarse.include_input_xyz,
        include_input_dir=cfg.models.coarse.include_input_dir,
        use_viewdirs=cfg.models.coarse.use_viewdirs,
    )
    mc = ref_models.FlexibleNeRFModel(**kwargs)
    mc.load_state_dict(ckpt["model_coarse_state_dict"])
    mc.eval()
    mf = None
    if ckpt.get("model_fine_state_dict"):
        mf = ref_models.FlexibleNeRFModel(**kwargs)
        mf.load_state_dict(ckpt["model_fine_state_dict"])
        mf.eval()

    enc_pos = get_embedding_function(
        num_encoding_functions=cfg.models.coarse.num_encoding_fn_xyz,
        include_input=cfg.models.coarse.include_input_xyz,
        log_sampling=cfg.models.coarse.log_sampling_xyz,
    )
    enc_dir = get_embedding_function(
        num_encoding_functions=cfg.models.coarse.num_encoding_fn_dir,
        include_input=cfg.models.coarse.include_input_dir,
        log_sampling=cfg.models.coarse.log_sampling_dir,
    )
    H, W, focal = hwf
    with torch.no_grad():
        out = run_one_iter_of_nerf(
            H,
            W,
            focal,
            mc,
            mf,
            torch.from_numpy(np.asarray(ro, np.float32)),
            torch.from_numpy(np.asarray(rd, np.float32)),
            cfg,
            mode="validation",
            encode_position_fn=enc_pos,
            encode_direction_fn=enc_dir,
            m_thres_cand=np.arange(5, 15, 5),
        )
    rgb_fine = out[3] if out[3] is not None else out[0]
    depth_fine = out[4] if out[3] is not None else out[1]
    return (
        np.asarray(rgb_fine.numpy(), np.float32),
        np.asarray(depth_fine.numpy(), np.float32),
        cfg,
    )


def ours_render(ckpt_path: str, cfg, ro, rd, hwf):
    """Render the same rays through this framework."""
    import jax.numpy as jnp

    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.render import RenderSettings, render_image
    from dexnerf_tpu.train import import_torch_checkpoint

    imported = import_torch_checkpoint(ckpt_path)
    params = {"coarse": imported["coarse"]}
    if imported["fine"] is not None:
        params["fine"] = imported["fine"]

    mc = cfg.models.coarse
    model = FlexibleNeRFModel(
        num_layers=4,  # shipped-checkpoint architecture (see above)
        hidden_size=128,
        skip_connect_every=4,
        num_encoding_fn_xyz=mc.num_encoding_fn_xyz,
        num_encoding_fn_dir=mc.num_encoding_fn_dir,
        include_input_xyz=mc.include_input_xyz,
        include_input_dir=mc.include_input_dir,
        use_viewdirs=mc.use_viewdirs,
    )
    v = cfg.nerf.validation
    settings = RenderSettings(
        num_coarse=int(v.num_coarse),
        num_fine=int(v.num_fine),
        perturb=False,
        lindisp=bool(getattr(v, "lindisp", False)),
        radiance_field_noise_std=0.0,
        white_background=bool(getattr(v, "white_background", False)),
        m_thres_cand=(),
        use_viewdirs=bool(cfg.nerf.use_viewdirs),
        num_encoding_fn_xyz=int(mc.num_encoding_fn_xyz),
        num_encoding_fn_dir=int(mc.num_encoding_fn_dir),
        include_input_xyz=bool(mc.include_input_xyz),
        include_input_dir=bool(mc.include_input_dir),
        log_sampling_xyz=bool(mc.log_sampling_xyz),
        log_sampling_dir=bool(mc.log_sampling_dir),
    )
    H, W, focal = hwf
    use_ndc = not bool(cfg.dataset.no_ndc)
    fine_fn = model.apply if "fine" in params else None
    out = render_image(
        model.apply,
        fine_fn,
        params,
        jnp.asarray(ro),
        jnp.asarray(rd),
        float(cfg.dataset.near),
        float(cfg.dataset.far),
        settings,
        block_size=4096,
        use_ndc=use_ndc,
        height=H,
        width=W,
        focal_length=focal,
    )
    rendered = out.fine if out.fine is not None else out.coarse
    return np.asarray(rendered.rgb), np.asarray(rendered.depth)


def compare_scene(scene: str, size: int = 32, ndc: bool = False):
    """Returns the parity record for one pretrained scene.

    ``ndc=True`` exercises the LLFF forward-facing path (fern): a camera at
    a small offset looking down -z, rays NDC-projected inside both render
    paths (reference ``train_utils.py:238-245`` / our ``make_ray_batch``).
    """
    from dexnerf_tpu.core.rays import get_ray_bundle_c2w

    import jax.numpy as jnp

    ckpt_path = latest_ckpt(scene)
    cfg_path = os.path.join(PRETRAINED, scene, "config.yml")

    H = W = size
    focal = 0.5 * W / np.tan(0.5 * BLENDER_CAMERA_ANGLE_X)
    if ndc:
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.05  # slight lateral offset, forward-facing
    else:
        pose = _pose_spherical_c2w(37.0, -30.0, 4.0)
    ro, rd = get_ray_bundle_c2w(H, W, focal, jnp.asarray(pose))
    ro = np.asarray(ro)
    rd = np.asarray(rd)

    ref_rgb, ref_depth, cfg = reference_render(
        ckpt_path, cfg_path, ro, rd, (H, W, focal)
    )
    our_rgb, our_depth = ours_render(ckpt_path, cfg, ro, rd, (H, W, focal))

    mse = float(np.mean((ref_rgb - our_rgb) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    return {
        "scene": scene,
        "checkpoint": os.path.basename(ckpt_path),
        "size": size,
        "rgb_psnr_between_impls_db": round(psnr, 2),
        "rgb_max_abs_diff": round(float(np.max(np.abs(ref_rgb - our_rgb))), 6),
        "depth_mean_abs_diff_m": round(
            float(np.mean(np.abs(ref_depth - our_depth))), 6
        ),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--scenes",
        type=str,
        default="lego-lowres,chair-lowres,hotdog-lowres,drums-lowres,"
        "materials-lowres,ship-lowres",
        help="comma-separated pretrained scene dirs (blender-convention)",
    )
    p.add_argument("--size", type=int, default=32)
    p.add_argument("--json", type=str, default="")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    records = []
    for scene in args.scenes.split(","):
        scene = scene.strip()
        rec = compare_scene(
            scene, size=args.size, ndc=scene.startswith("fern")
        )
        records.append(rec)
        print(json.dumps(rec))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(records, f, indent=1)
    worst = min(r["rgb_psnr_between_impls_db"] for r in records)
    print(f"worst-case cross-implementation PSNR: {worst:.2f} dB")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
