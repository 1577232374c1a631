"""Unified training driver.

One loop covers the reference's four copy-pasted entry scripts
(``train_nerf_rgb.py`` / ``train_dexnerf_rgb.py`` / ``train_nerf_ir.py`` /
``train_dexnerf_ir.py``) as two orthogonal flags:

* ``supervision``: ``"rgb"`` (photometric MSE) or ``"luminance"``
  (Rec.601-luma MSE, the IR variants);
* ``dex``: when True, validation sweeps the σ-threshold candidate grid and
  selects the min-abs-error depth (``train_dexnerf_rgb.py:393-428``);
  when False, validation evaluates the standard expected depth
  (``train_nerf_rgb.py:361-425``).

The hot loop is fully device-resident (see ``dexnerf_tpu.train.step``); the
host handles logging, validation renders, and checkpointing.
"""

from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass, replace as dc_replace
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dexnerf_tpu.config import (
    CfgNode,
    models_from_cfg,
    render_settings_from_cfg,
)
from dexnerf_tpu.core.encoding import encoding_dim
from dexnerf_tpu.core.metrics import compute_err_metric, mse2psnr, ssim
from dexnerf_tpu.data.blender import load_blender_data, load_blender_depths
from dexnerf_tpu.data.llff import load_llff_data
from dexnerf_tpu.data.messytable import load_messytable_data
from dexnerf_tpu.data.pipeline import build_ray_store
from dexnerf_tpu.render.renderer import render_image
from dexnerf_tpu.train.checkpoints import (
    AsyncCheckpointManager,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from dexnerf_tpu.train.logging import MetricsLogger, save_depth_png_mm
from dexnerf_tpu.train.step import (
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
)


@dataclass
class SceneData:
    """Loaded scene, normalized across the three dataset formats."""

    images: np.ndarray  # [N, H, W, 3]
    poses: np.ndarray  # [N, 4, 4] (c2w) or [N, 4, 4] w2c for messytable
    hwf: list
    i_train: np.ndarray
    i_val: np.ndarray
    i_test: Optional[np.ndarray] = None  # held-out split (val when absent)
    intrinsics: Optional[np.ndarray] = None  # [N, 3, 3] (messytable)
    depths: Optional[np.ndarray] = None  # [N, H, W] GT depth in meters
    render_poses: Optional[np.ndarray] = None
    use_ndc: bool = False


def load_scene(cfg: CfgNode) -> SceneData:
    """Load the dataset named by ``cfg.dataset`` into a SceneData."""
    ds = cfg.dataset
    dtype = str(ds.type).lower()
    if dtype == "blender":
        images, poses, render_poses, hwf, i_split = load_blender_data(
            ds.basedir,
            half_res=bool(_get(ds, "half_res", False)),
            testskip=int(_get(ds, "testskip", 1)),
            debug=bool(_get(ds, "debug", False)),
        )
        images = images[..., :3]
        depths = load_blender_depths(
            ds.basedir,
            testskip=int(_get(ds, "testskip", 1)),
            half_res=bool(_get(ds, "half_res", False)),
            debug=bool(_get(ds, "debug", False)),
        )
        return SceneData(
            images=images,
            poses=poses,
            hwf=hwf,
            i_train=i_split[0],
            i_val=i_split[1],
            i_test=i_split[2],
            depths=depths,
            render_poses=render_poses,
        )
    if dtype == "messytable":
        (
            images,
            poses,
            render_poses,
            hwf,
            i_split,
            intrinsics,
            depths,
        ) = load_messytable_data(
            ds.basedir,
            half_res=bool(_get(ds, "half_res", False)),
            testskip=int(_get(ds, "testskip", 1)),
            debug=bool(_get(ds, "debug", False)),
            imgname=str(_get(ds, "imgname", "0128_irL_kuafu_half.png")),
            is_real_rgb=bool(_get(ds, "is_real_rgb", False)),
        )
        return SceneData(
            images=images,
            poses=poses,
            hwf=hwf,
            i_train=i_split[0],
            i_val=i_split[1],
            i_test=i_split[2],
            intrinsics=intrinsics,
            depths=depths,
            render_poses=render_poses,
        )
    if dtype == "llff":
        images, poses, bds, render_poses, i_test = load_llff_data(
            ds.basedir,
            factor=int(_get(ds, "downsample_factor", 8)),
            spherify=bool(_get(ds, "spherify", False)),
            path_zflat=bool(_get(ds, "path_zflat", False)),
        )
        hwf = poses[0, :3, -1]
        poses34 = poses[:, :3, :4]
        n = images.shape[0]
        poses44 = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        poses44[:, :3, :4] = poses34
        llffhold = int(_get(ds, "llffhold", 8))
        if llffhold > 0:
            i_val = np.arange(n)[::llffhold]
        else:
            i_val = np.array([i_test])
        i_train = np.array(
            [i for i in np.arange(n) if i not in set(i_val.tolist())]
        )
        from dexnerf_tpu.data.llff import load_llff_depths

        return SceneData(
            images=images,
            poses=poses44,
            hwf=[int(hwf[0]), int(hwf[1]), float(hwf[2])],
            i_train=i_train,
            i_val=i_val,
            # LLFF convention: the llffhold views ARE the held-out set
            i_test=i_val,
            # teacher-depth sidecars (metric ray distance in scene units,
            # converted from NDC at generation time —
            # tools/make_llff_dataset_from_ckpt.py --save-depth)
            depths=load_llff_depths(ds.basedir, n),
            render_poses=render_poses,
            use_ndc=not bool(_get(ds, "no_ndc", True)),
        )
    raise ValueError(f"unknown dataset type: {ds.type}")


def _get(node, key, default):
    try:
        return node[key]
    except (KeyError, TypeError):
        return default


def maybe_fused_fields(cfg: CfgNode, *, train: bool = False):
    """(coarse_field, fine_field) Pallas fused-kernel field functions when
    ``cfg.nerf.use_pallas`` is set and the models are FlexibleNeRFModel;
    (None, None) otherwise (the renderer then uses the XLA path).

    ``train=True`` returns the custom-VJP training kernels
    (``ops/fused_mlp_train.py``) so the flag affects the train step, not just
    validation renders."""
    if not bool(_get(cfg.nerf, "use_pallas", False)):
        return None, None
    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.ops import (
        make_fused_flexible_field,
        make_fused_flexible_field_train,
    )

    if not bool(_get(cfg.nerf, "use_viewdirs", True)):
        # the fused kernels require viewdirs; degrade to the XLA path
        # instead of raising on a use_pallas + use_viewdirs:false config
        import warnings

        warnings.warn(
            "cfg.nerf.use_pallas is set but use_viewdirs is false; the "
            "fused Pallas kernels require viewdirs — using the XLA path",
            stacklevel=2,
        )
        return None, None

    # Pallas has no CPU lowering; fall back to the interpreter off-TPU.
    interpret = jax.default_backend() == "cpu"
    # TPU-validated configuration (docs/PERF_NOTES.md): bf16 matmul
    # operands / f32 chain, fwd+bwd block 4096 with the ray-part
    # interleave — 19.9 ms/step vs 33.1 XLA on v5e (the combined loss
    # kernel at 14.0 ms remains the default; this is its fallback).
    # Overridable via cfg.nerf.pallas_*.
    cdt = str(_get(cfg.nerf, "pallas_compute_dtype", "bfloat16"))
    block = int(_get(cfg.nerf, "pallas_block_samples", 4096))
    kwargs = dict(
        block_samples=block,
        compute_dtype=jnp.bfloat16 if cdt == "bfloat16" else jnp.float32,
        interpret=interpret,
    )
    if train:
        make = make_fused_flexible_field_train
        kwargs.update(
            block_samples_bwd=block, dw_dtype=kwargs["compute_dtype"]
        )
    else:
        make = make_fused_flexible_field

    coarse, fine = models_from_cfg(cfg)
    cf = (
        make(coarse, **kwargs)
        if isinstance(coarse, FlexibleNeRFModel) and coarse.use_viewdirs
        else None
    )
    ff = (
        make(fine, **kwargs)
        if isinstance(fine, FlexibleNeRFModel) and fine.use_viewdirs
        else None
    )
    return cf, ff


def maybe_fused_loss(
    cfg: CfgNode,
    settings,
    supervision: str,
    depth_loss_weight: float = 0.0,
    depth_valid_max=None,
):
    """The combined loss+gradients kernel path (``ops/fused_train_loss``)
    when ``cfg.nerf.use_pallas`` is set — the fastest TPU train path (the
    forward runs once per step; the separate-field path recomputes it in
    the backward kernel). Opt-out via ``cfg.nerf.pallas_fused_loss: false``
    (falls back to the fused fields). None when unavailable (non-Flexible
    models, no viewdirs)."""
    if not bool(_get(cfg.nerf, "use_pallas", False)):
        return None
    if not bool(_get(cfg.nerf, "pallas_fused_loss", True)):
        return None
    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.ops import make_fused_train_loss

    coarse, fine = models_from_cfg(cfg)
    if not isinstance(coarse, FlexibleNeRFModel) or not coarse.use_viewdirs:
        return None
    if fine is not None and not isinstance(fine, FlexibleNeRFModel):
        return None
    if not settings.use_viewdirs:
        return None
    cdt = str(_get(cfg.nerf, "pallas_compute_dtype", "bfloat16"))
    dtype = jnp.bfloat16 if cdt == "bfloat16" else jnp.float32
    # measured block sweet spot (docs/PERF_NOTES.md "interleave"): 8192
    # with 8-way ray-part interleave, for widths through 256; beyond that
    # the saved activations (block x width x layers, compute_dtype) press
    # the 100 MB VMEM budget, so fall back to a small block
    default_block = 8192 if coarse.hidden_size <= 256 else 1024
    parts_cfg = _get(cfg.nerf, "pallas_loss_parts", None)
    return make_fused_train_loss(
        coarse,
        fine,
        settings,
        supervision=supervision,
        block_samples=int(
            _get(cfg.nerf, "pallas_loss_block_samples", default_block)
        ),
        compute_dtype=dtype,
        dw_dtype=dtype,
        interpret=jax.default_backend() == "cpu",
        parts=None if parts_cfg is None else int(parts_cfg),
        depth_loss_weight=float(depth_loss_weight),
        depth_valid_max=depth_valid_max,
        resample=str(_get(cfg.nerf, "pallas_loss_resample", "auto")),
    )


def maybe_fused_render_impl(cfg: CfgNode, settings):
    """A fully fused PE→MLP→compositing ``rays_impl`` for render_image
    (deterministic validation/eval path); None selects the plain XLA
    renderer.

    Default is AUTO: on TPU the fused kernel is the shipping path — with
    the fast PE sine it renders 400x400 frames in 202.6 ms vs XLA's
    283.8 ms (790 vs 564 krays/s, block 8192; round-3 chip sweep,
    docs/PERF_NOTES.md) — while CPU/interpret stays XLA. Set
    ``cfg.nerf.use_fused_render`` to force either way."""
    flag = _get(cfg.nerf, "use_fused_render", None)
    if flag is None:
        flag = jax.default_backend() not in ("cpu",)
    if not bool(flag):
        return None
    from dexnerf_tpu.models import FlexibleNeRFModel

    coarse, fine = models_from_cfg(cfg)
    if not isinstance(coarse, FlexibleNeRFModel) or not coarse.use_viewdirs:
        return None
    if fine is not None and not isinstance(fine, FlexibleNeRFModel):
        return None
    cdt = str(_get(cfg.nerf, "pallas_compute_dtype", "bfloat16"))
    # memoized so repeated calls (one per validation) return the SAME
    # closure object — _validate_render_fn keys its jit cache on it
    return _fused_render_impl_cached(
        coarse,
        fine,
        settings,
        # render block default 8192: the round-3 chip sweep measured
        # 215.7 / 204.1 / 202.6 ms/frame at blocks 1024 / 4096 / 8192
        int(
            _get(
                cfg.nerf,
                "pallas_render_block_samples",
                _get(cfg.nerf, "pallas_block_samples", 8192),
            )
        ),
        jnp.bfloat16 if cdt == "bfloat16" else jnp.float32,
        jax.default_backend() == "cpu",
    )


@functools.lru_cache(maxsize=16)
def _fused_render_impl_cached(
    coarse, fine, settings, block_samples, compute_dtype, interpret
):
    from dexnerf_tpu.ops import make_fused_render_rays

    return make_fused_render_rays(
        coarse,
        fine,
        settings,
        block_samples=block_samples,
        compute_dtype=compute_dtype,
        interpret=interpret,
    )


def align_cfg_models_to_checkpoint(cfg: CfgNode, imported: Dict) -> CfgNode:
    """Reconcile ``cfg.models.*`` with a reference checkpoint's ACTUAL
    architecture (in place; returns ``cfg``).

    The reference silently ignores ``num_layers``/``hidden_size``/
    ``skip_connect_every`` from config when constructing its models
    (``train_nerf_rgb.py:122-128``), so every shipped ``pretrained/``
    scene's ``config.yml`` declares 8x256 while its ``.ckpt`` holds the
    4x128 constructor defaults. We honor config for FRESH models (that
    reference bug is fixed on purpose) — but when loading a reference
    ``.ckpt`` the weights are the truth: this infers each model's real
    architecture from the imported tree and updates the config block to
    match (warning when it changes), so everything built FROM the config
    downstream — apply fns, the fused Pallas kernels, export — agrees
    with the parameters.
    """
    import warnings

    from dexnerf_tpu.train.checkpoints import (
        _skip_positions,
        infer_flexible_arch,
    )

    use_vd = bool(cfg.nerf.use_viewdirs)
    was_frozen = cfg.is_frozen()
    changed = []
    for name in ("coarse", "fine"):
        tree = imported.get(name)
        blk = _get(cfg.models, name, None)
        if tree is None or blk is None:
            continue
        if str(_get(blk, "type", "FlexibleNeRFModel")) != "FlexibleNeRFModel":
            continue
        arch = infer_flexible_arch(tree, use_vd)
        cfg_layers = int(_get(blk, "num_layers", 4))
        cfg_hidden = int(_get(blk, "hidden_size", 128))
        cfg_skip = int(_get(blk, "skip_connect_every", 4))
        same = (
            cfg_layers == arch["num_layers"]
            and cfg_hidden == arch["hidden_size"]
            and _skip_positions(cfg_layers - 1, cfg_skip)
            == _skip_positions(
                arch["num_layers"] - 1, arch["skip_connect_every"]
            )
        )
        if same:
            continue
        if cfg.is_frozen():
            cfg.defrost()
        for k, v in arch.items():
            setattr(blk, k, int(v))
        changed.append(
            f"models.{name}: {cfg_layers}x{cfg_hidden} (skip {cfg_skip}) "
            f"-> {arch['num_layers']}x{arch['hidden_size']} "
            f"(skip {arch['skip_connect_every']})"
        )
    if changed:
        warnings.warn(
            "checkpoint architecture overrides the config (the reference "
            "ignores these config knobs, train_nerf_rgb.py:122-128): "
            + "; ".join(changed),
            stacklevel=2,
        )
        if was_frozen:
            cfg.freeze()
    return cfg


def load_eval_params(cfg: CfgNode, checkpoint: str):
    """Load inference params from either a reference ``.ckpt`` or an orbax
    checkpoint (file, step dir, or checkpoints dir — latest picked).

    The shared half of every inference entry point (eval / serve / mesh /
    the dataset and probe tools): for a reference ``.ckpt`` the config's
    model blocks are reconciled with the checkpoint's ACTUAL architecture
    first (see :func:`align_cfg_models_to_checkpoint`) so everything built
    from the config downstream agrees with the weights.

    Returns ``(cfg, params, hwf, imported)`` where ``params`` is
    ``{"coarse": ..., ["fine": ...]}``, ``hwf`` is ``(H, W, focal)`` when
    the checkpoint carries frame geometry (reference ``.ckpt``s may,
    ``eval_nerf.py:147-152``) else ``None``, and ``imported`` is the raw
    import dict for ``.ckpt`` sources (``None`` for orbax) for callers
    that need the extra keys (step, Adam moments, ...).
    """
    imported = None
    if str(checkpoint).endswith(".ckpt"):
        # reference PyTorch checkpoint; shipped reference configs declare
        # architectures their checkpoints do not hold (the reference
        # ignores those knobs, train_nerf_rgb.py:122-128) — trust the
        # weights
        from dexnerf_tpu.train.checkpoints import import_torch_checkpoint

        imported = import_torch_checkpoint(checkpoint)
        cfg = align_cfg_models_to_checkpoint(cfg, imported)
        params = {"coarse": imported["coarse"]}
        if imported["fine"] is not None:
            params["fine"] = imported["fine"]
        hwf = None
        if all(
            imported.get(k) is not None
            for k in ("height", "width", "focal_length")
        ):
            hwf = (
                int(imported["height"]),
                int(imported["width"]),
                float(imported["focal_length"]),
            )
        return cfg, params, hwf, imported

    from dexnerf_tpu.train.checkpoints import (
        latest_checkpoint,
        restore_checkpoint,
    )

    ckpt = checkpoint
    if os.path.isdir(ckpt):
        # allow passing the checkpoints directory: pick the latest
        resolved = latest_checkpoint(ckpt)
        if resolved is not None:
            ckpt = resolved
    return cfg, restore_checkpoint(ckpt)["params"], None, None


def setup_models(cfg: CfgNode, seed: int):
    """Init coarse/fine models + params; returns (apply_c, apply_f, params)."""
    coarse, fine = models_from_cfg(cfg)
    s = render_settings_from_cfg(cfg, "train")
    in_dim = encoding_dim(
        3, s.num_encoding_fn_xyz, s.include_input_xyz
    ) + (
        encoding_dim(3, s.num_encoding_fn_dir, s.include_input_dir)
        if s.use_viewdirs
        else 0
    )
    key = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, in_dim))
    params = {"coarse": coarse.init(key, dummy)}
    fine_apply = None
    if fine is not None:
        params["fine"] = fine.init(jax.random.fold_in(key, 1), dummy)
        fine_apply = fine.apply
    return coarse.apply, fine_apply, params


@functools.lru_cache(maxsize=16)
def _validate_render_fn(
    coarse_fn,
    fine_fn,
    settings,
    near,
    far,
    use_ndc,
    height,
    width,
    focal,
    block_size,
    rays_impl,
):
    """Jitted full-frame validation render returning ONLY what validate()
    consumes (unused outputs — notably the [rays, samples] weights — are
    then dead-code-eliminated instead of materialized). Memoized so repeat
    validations reuse one compiled program; all keys are hashable (flax
    apply methods, frozen RenderSettings, the memoized fused-render impl).
    """

    @jax.jit
    def run(params, ro, rd):
        out = render_image(
            coarse_fn,
            fine_fn,
            params,
            ro,
            rd,
            near,
            far,
            settings,
            block_size=block_size,
            use_ndc=use_ndc,
            height=height,
            width=width,
            focal_length=focal,
            rays_impl=rays_impl,
        )
        r = out.fine if out.fine is not None else out.coarse
        return {
            "rgb": r.rgb,
            "rgb_coarse": out.coarse.rgb,
            "rgb_fine": None if out.fine is None else out.fine.rgb,
            "depth": r.depth,
            "depth_dex": r.depth_dex,
        }

    return run


def validate(
    coarse_fn,
    fine_fn,
    params,
    scene: SceneData,
    cfg: CfgNode,
    *,
    dex: bool,
    supervision: str,
    val_idx: Optional[int] = None,
    block_size: int = 4096,
    mesh=None,
) -> Dict[str, Any]:
    """Full-image validation render + metrics.

    Standard mode: PSNR of the fine rgb vs target; expected-depth metrics
    when GT depth exists (``train_nerf_rgb.py:304-425``). Dex mode:
    σ-threshold sweep, min-abs-err selection (``train_dexnerf_rgb.py:363-428``).
    ``mesh`` (a 1-D device mesh) tiles the frame's rays across chips
    (SURVEY.md §2.2 full-frame eval tiling).
    """
    s_val = render_settings_from_cfg(cfg, "validation", dex=dex)
    H, W, focal = scene.hwf
    idx = int(scene.i_val[0]) if val_idx is None else int(val_idx)

    from dexnerf_tpu.core.rays import get_ray_bundle_c2w, get_ray_bundle_w2c

    if scene.intrinsics is not None:
        ro, rd = get_ray_bundle_w2c(
            H, W, jnp.asarray(scene.poses[idx]), jnp.asarray(scene.intrinsics[idx])
        )
    else:
        ro, rd = get_ray_bundle_c2w(H, W, focal, jnp.asarray(scene.poses[idx]))

    if mesh is not None:
        from dexnerf_tpu.parallel import render_image_parallel

        out = render_image_parallel(
            mesh,
            coarse_fn,
            fine_fn,
            params,
            ro,
            rd,
            float(cfg.dataset.near),
            float(cfg.dataset.far),
            s_val,
            block_size=block_size,
            use_ndc=scene.use_ndc,
            height=H,
            width=W,
            focal_length=focal,
        )
        r = out.fine if out.fine is not None else out.coarse
        slim = {
            "rgb": r.rgb,
            "rgb_coarse": out.coarse.rgb,
            "rgb_fine": None if out.fine is None else out.fine.rgb,
            "depth": r.depth,
            "depth_dex": r.depth_dex,
        }
    else:
        # one cached jitted program per (models, settings, frame geometry):
        # run eagerly, a full-frame render costs a remote dispatch per op
        # and materializes every output (per-sample weights included) —
        # ~40x slower over the TPU tunnel than the compiled program
        run = _validate_render_fn(
            coarse_fn,
            fine_fn,
            s_val,
            float(cfg.dataset.near),
            float(cfg.dataset.far),
            bool(scene.use_ndc),
            int(H),
            int(W),
            float(focal),
            int(block_size),
            maybe_fused_render_impl(cfg, s_val),
        )
        slim = run(params, ro, rd)
    target = jnp.asarray(scene.images[idx][..., :3])

    # coarse/fine loss split, logged like the reference
    # (train_dexnerf_rgb.py:366-385)
    if supervision in ("luminance", "sg_ir"):
        # sg_ir trains a shaded-IR loss (render/sg_ir.py); validation
        # compares plain luminance (the shaded full-frame render is an
        # analysis tool, not a per-iteration metric)
        from dexnerf_tpu.train.step import luminance

        def _mse(render_rgb):
            return float(
                jnp.mean((luminance(render_rgb) - luminance(target)) ** 2)
            )
    else:
        def _mse(render_rgb):
            return float(jnp.mean((render_rgb - target) ** 2))

    coarse_mse = _mse(slim["rgb_coarse"])
    fine_mse = _mse(slim["rgb_fine"]) if slim["rgb_fine"] is not None else 0.0
    mse = coarse_mse + fine_mse
    metrics: Dict[str, Any] = {
        "loss": mse,
        "coarse_loss": coarse_mse,
        "fine_loss": fine_mse,
        "psnr": mse2psnr(mse),
        # second standard NeRF quality metric (beyond the reference's PSNR)
        "ssim": float(ssim(slim["rgb"], target)),
        "rgb": np.asarray(slim["rgb"]),
        "rgb_coarse": np.asarray(slim["rgb_coarse"]),
        "depth": np.asarray(slim["depth"]),
        "target": np.asarray(target),
        "index": idx,
    }

    if dex and slim["depth_dex"] is not None:
        metrics["depth_dex"] = np.asarray(slim["depth_dex"])  # [T, H, W]
        metrics["m_thres_cand"] = tuple(s_val.m_thres_cand)

    if scene.depths is not None and scene.use_ndc:
        # NDC renders report depth as the NDC ray parameter while sidecars
        # are metric ray distance — comparing them here would log junk.
        # apps.eval --test-set does the NDC→world conversion and is the
        # scored surface for LLFF depth (core.rays.ndc_t_to_world_depth).
        pass
    elif scene.depths is not None:
        gt = scene.depths[idx]
        # validity mask 0 < d < depth_valid_max, default 1.25 m
        # (reference hardcodes 1.25, train_nerf_rgb.py:390)
        valid_max = float(_get(cfg.dataset, "depth_valid_max", 1.25))
        mask = (gt > 0) & (gt < valid_max)
        metrics["depth_gt"] = np.asarray(gt)
        metrics["depth_mask"] = np.asarray(mask)
        if not np.any(np.asarray(gt) > 0):
            # this view carries no GT depth at all (blender sidecars exist
            # only for test views; absent views are zero-filled) — skip
            # rather than log NaNs. An empty VALIDITY mask over real data
            # still computes (NaN) metrics, matching the reference's
            # unguarded masking (train_nerf_rgb.py:390).
            pass
        else:
            # expected-depth metrics ALWAYS (the dex-vs-expected
            # comparison is the point of Dex-NeRF; before round 5 the dex
            # branch shadowed this control column — the
            # MESSYTABLE_CHIP.json null the round-4 verdict flagged)
            err = compute_err_metric(
                jnp.asarray(gt), jnp.asarray(slim["depth"]), jnp.asarray(mask)
            )
            metrics.update(err)
            if dex and slim["depth_dex"] is not None:
                depth_dex = np.asarray(slim["depth_dex"])  # [T, H, W]
                errs = []
                for t in range(depth_dex.shape[0]):
                    err = compute_err_metric(
                        jnp.asarray(gt), jnp.asarray(depth_dex[t]),
                        jnp.asarray(mask)
                    )
                    errs.append(err)
                abs_errs = [e["depth_abs_err"] for e in errs]
                best = int(np.argmin(abs_errs))
                metrics["dex_errors"] = errs
                metrics["best_threshold_index"] = best
                metrics["best_threshold"] = float(s_val.m_thres_cand[best])
                metrics["min_abs_err"] = float(abs_errs[best])
                metrics["best_depth"] = depth_dex[best]
                metrics["err4"] = errs[best]["depth_err4"]
    return metrics


def _normalize_img(x: np.ndarray) -> np.ndarray:
    """Min-max normalize to [0, 1] — the reference displays depth images via
    ``vutils.make_grid(..., normalize=True, scale_each=True)``
    (``train_dexnerf_rgb.py:396-401``)."""
    x = np.asarray(x, np.float32)
    lo, hi = float(x.min()), float(x.max())
    return (x - lo) / max(hi - lo, 1e-12)


def _log_validation(
    logger: "MetricsLogger",
    val: Dict[str, Any],
    step: int,
    logdir: str,
    *,
    save_artifacts: bool = True,
) -> None:
    """Log the reference's full validation artifact set.

    Scalars ``validation/{loss,coarse_loss,fine_loss,psnr,min_abs_err,err4,
    depth_abs_err,depth_err4}`` and images ``validation/{rgb_coarse,rgb_fine,
    img_target,depth_gt,depth_pred_<m>,depth_pred_err}``
    (``train_dexnerf_rgb.py:375-428``); the best depth is additionally saved
    as a uint32 millimeter PNG under ``<logdir>/pred_depth/``
    (``train_dexnerf_rgb.py:410-414``).
    """
    from dexnerf_tpu.core.metrics import depth_error_img

    logger.scalar("validation/loss", val["loss"], step)
    logger.scalar("validation/coarse_loss", val.get("coarse_loss", val["loss"]), step)
    logger.scalar("validation/fine_loss", val.get("fine_loss", 0.0), step)
    logger.scalar("validation/psnr", val["psnr"], step)
    if "ssim" in val:
        logger.scalar("validation/ssim", float(val["ssim"]), step)
    for k in ("depth_abs_err", "depth_err4", "min_abs_err", "err4"):
        if k in val:
            logger.scalar(f"validation/{k}", float(val[k]), step)

    logger.image("validation/rgb_coarse", np.clip(val["rgb_coarse"], 0, 1), step)
    logger.image("validation/rgb_fine", np.clip(val["rgb"], 0, 1), step)
    if "target" in val:
        logger.image("validation/img_target", np.clip(val["target"], 0, 1), step)
    if "depth_gt" in val:
        logger.image("validation/depth_gt", _normalize_img(val["depth_gt"]), step)

    if "depth_dex" in val:
        # one image per candidate threshold (train_dexnerf_rgb.py:396-401)
        for t, m in enumerate(val.get("m_thres_cand", ())):
            logger.image(
                f"validation/depth_pred_{int(m)}",
                _normalize_img(val["depth_dex"][t]),
                step,
            )

    best_depth = val.get("best_depth")
    if best_depth is None and "depth_gt" in val:
        best_depth = val["depth"]  # standard mode: expected depth
    if best_depth is not None and "depth_gt" in val:
        # |error| colormap in millimeters (train_dexnerf_rgb.py:415-421)
        err_img = depth_error_img(
            np.asarray(best_depth)[None] * 1000.0,
            np.asarray(val["depth_gt"])[None] * 1000.0,
            np.asarray(val["depth_mask"])[None],
        )
        logger.image("validation/depth_pred_err", err_img, step)
        if save_artifacts:
            pred_dir = os.path.join(logdir, "pred_depth")
            os.makedirs(pred_dir, exist_ok=True)
            save_depth_png_mm(
                os.path.join(pred_dir, f"pred_depth_step_{step}.png"),
                best_depth,
            )


def run_training(
    cfg: CfgNode,
    *,
    dex: bool = False,
    supervision: str = "rgb",
    scene: Optional[SceneData] = None,
    load_ckpt: Optional[str] = None,
    auto_resume: bool = False,
    max_iters: Optional[int] = None,
    logdir: Optional[str] = None,
    use_tensorboard: bool = True,
    save_artifacts: bool = True,
    num_devices: Optional[int] = None,
    sampling: Optional[str] = None,
    steps_per_call: Optional[int] = None,
    pose_opt: Optional[bool] = None,
    depth_loss_weight: Optional[float] = None,
    depth_warmup: Optional[int] = None,
    occupancy: Optional[float] = None,
) -> Dict[str, Any]:
    """Train a NeRF per ``cfg``. Returns a summary dict (final metrics).

    ``scene`` may be injected (tests / synthetic data); otherwise loaded from
    ``cfg.dataset``. ``max_iters`` overrides ``cfg.experiment.train_iters``.
    ``num_devices`` > 1 trains data-parallel over a 1-D mesh
    (per-device ray sampling, gradient pmean over ICI;
    ``num_random_rays`` is the GLOBAL batch and must divide by it).

    Resume: ``load_ckpt`` accepts an Orbax checkpoint path, a directory of
    them (picks the latest), or a reference PyTorch ``.ckpt``
    (models + optimizer moments + start_iter, ``train_nerf_rgb.py:168-174``).
    ``auto_resume`` resumes from ``<logdir>/checkpoints`` when one exists.

    ``sampling`` ("uniform" | "per_image") and ``steps_per_call`` override
    ``cfg.nerf.train.{sampling,steps_per_call}``.

    ``pose_opt`` (or ``cfg.nerf.train.pose_opt``) enables SE(3) camera-pose
    refinement: per-train-image correction twists train alongside the
    fields (``train/pose_opt.py`` — the reference's dead ``lieutils.py``
    capability made live). Pose twists use their own learning rate
    (``cfg.optimizer.pose_lr``, default 1e-3) and always take the XLA
    render path (the fused kernels' zero-ray-cotangent contract excludes
    them).

    ``occupancy`` (or ``cfg.nerf.train.occupancy``) > 0 enables
    occupancy-guided training: a σ > threshold occupancy grid is baked
    from the in-progress field at ``occupancy_start_iter`` and every
    ``occupancy_rebake_every`` iterations after, and every stored ray's
    ``[near, far]`` is tightened to its occupied span (misses keep the
    full interval), so the fixed per-ray sample budget concentrates
    where matter is — a smaller ``num_coarse``/``num_fine`` then buys
    speed without the quality cost (measured for rendering in
    docs/PERF_NOTES.md "Occupancy-guided rendering"). World-space only
    (not NDC), device-resident store only, exclusive with pose
    refinement.

    ``depth_loss_weight`` (or ``cfg.nerf.train.depth_loss_weight``) > 0
    adds GT-depth supervision on the rendered expected depth — the
    datasets the reference targets CARRY per-pixel GT depth (messytable),
    but the reference only ever computed metrics from it
    (``train_nerf_rgb.py:361-401``); here it can train. Valid-GT mask
    ``0 < d [< cfg.nerf.train.depth_valid_max]``. Works on the XLA path
    AND the combined Pallas loss kernel (the depth cotangent is computed
    in-kernel — ``ops.fused_train_loss`` ``depth_loss_weight``).
    """
    seed = int(_get(cfg.experiment, "randomseed", 42))
    np.random.seed(seed)

    imported_ref = None
    if load_ckpt and str(load_ckpt).endswith(".ckpt"):
        # reference PyTorch checkpoint: import ONCE, up front, so the
        # config's model blocks are reconciled with the checkpoint's
        # actual architecture before anything — apply fns, fused kernels,
        # the logdir config snapshot — is built from them
        from dexnerf_tpu.train.checkpoints import import_torch_checkpoint

        imported_ref = import_torch_checkpoint(
            load_ckpt, use_viewdirs=bool(cfg.nerf.use_viewdirs)
        )
        cfg = align_cfg_models_to_checkpoint(cfg, imported_ref)

    if scene is None:
        scene = load_scene(cfg)

    logdir = logdir or os.path.join(
        str(cfg.experiment.logdir), str(cfg.experiment.id)
    )
    # multi-host: every process trains (collectives need all of them), but
    # only the primary writes logs/artifacts/checkpoints
    is_primary = jax.process_index() == 0
    save_artifacts = save_artifacts and is_primary
    os.makedirs(logdir, exist_ok=True)
    if is_primary:
        with open(os.path.join(logdir, "config.yml"), "w") as f:
            f.write(cfg.dump())
    logger = MetricsLogger(
        logdir, use_tensorboard=use_tensorboard and is_primary,
        enabled=is_primary,
    )

    pose_opt = bool(
        _get(cfg.nerf.train, "pose_opt", False)
        if pose_opt is None
        else pose_opt
    )
    coarse_fn, fine_fn, params = setup_models(cfg, seed)
    if pose_opt:
        if supervision == "sg_ir":
            raise NotImplementedError("pose_opt + sg_ir is not supported")
        from dexnerf_tpu.train.pose_opt import init_pose_params

        params["pose"] = init_pose_params(len(scene.i_train))
    if supervision == "sg_ir":
        # active-IR SG shading (render/sg_ir.py): learnable illumination +
        # material parameters train alongside the fields
        from dexnerf_tpu.render.sg_ir import init_sg_ir_params

        params["sg"] = init_sg_ir_params(
            jax.random.fold_in(jax.random.PRNGKey(seed), 7),
            num_env_lobes=int(_get(cfg.nerf.train, "sg_env_lobes", 2)),
        )
    tx = make_optimizer(
        float(cfg.optimizer.lr),
        float(cfg.scheduler.lr_decay),
        float(cfg.scheduler.lr_decay_factor),
        opt_type=str(_get(cfg.optimizer, "type", "Adam")),
    )
    if pose_opt:
        from dexnerf_tpu.train.pose_opt import make_pose_optimizer
        from dexnerf_tpu.train.step import exponential_decay_schedule

        import optax

        pose_tx = optax.adam(
            exponential_decay_schedule(
                float(_get(cfg.optimizer, "pose_lr", 1e-3)),
                float(cfg.scheduler.lr_decay),
                float(cfg.scheduler.lr_decay_factor),
            )
        )
        tx = make_pose_optimizer(tx, pose_tx)
    state = init_train_state(params, tx)

    # resume
    if not load_ckpt and auto_resume:
        load_ckpt = latest_checkpoint(os.path.join(logdir, "checkpoints"))
    elif load_ckpt and os.path.isdir(load_ckpt) and latest_checkpoint(load_ckpt):
        load_ckpt = latest_checkpoint(load_ckpt)
    start_iter = 0
    if load_ckpt:
        if str(load_ckpt).endswith(".ckpt"):
            # reference PyTorch checkpoint: params + Adam moments + iter
            # (imported up front, before setup_models — see imported_ref)
            from dexnerf_tpu.train.checkpoints import (
                build_opt_state_from_torch,
            )

            use_vd = bool(cfg.nerf.use_viewdirs)
            imported = imported_ref
            new_params = {"coarse": imported["coarse"]}
            if imported["fine"] is not None and "fine" in state.params:
                new_params["fine"] = imported["fine"]
            if "sg" in params:
                # reference checkpoints carry no shading params; keep the
                # fresh init (sg_ir fine-tunes shading on top of them)
                new_params["sg"] = params["sg"]
            if "pose" in params:
                # reference checkpoints carry no pose twists; start at the
                # dataset poses
                new_params["pose"] = params["pose"]
            opt_state = (
                build_opt_state_from_torch(
                    imported, new_params, tx, use_viewdirs=use_vd
                )
                if "optimizer_state_dict" in imported
                else tx.init(new_params)
            )
            state = TrainState(
                step=jnp.asarray(imported["step"], jnp.int32),
                params=jax.tree.map(jnp.asarray, new_params),
                opt_state=opt_state,
            )
            start_iter = int(imported["step"])
        else:
            payload = restore_checkpoint(load_ckpt, template=state)
            state = TrainState(
                step=jnp.asarray(payload["step"]),
                params=payload["params"],
                opt_state=payload["opt_state"],
            )
            start_iter = int(payload["step"])

    s_train = render_settings_from_cfg(cfg, "train", dex=False)
    batch_size = int(cfg.nerf.train.num_random_rays)
    cachedir = str(_get(cfg.dataset, "cachedir", "") or "")
    depth_w = float(
        depth_loss_weight
        if depth_loss_weight is not None
        else (_get(cfg.nerf.train, "depth_loss_weight", 0.0) or 0.0)
    )
    # supervision valid-mask limit: explicit nerf.train.depth_valid_max
    # wins, else the dataset's METRIC mask limit when the config sets one
    # (the key validate()/eval use, reference train_nerf_rgb.py:390) — so
    # a config that masks its metrics never TRAINS against GT readings it
    # treats as invalid. No key set -> gt > 0 only (an implicit 1.25 m
    # cap would silently zero supervision on far-range scenes).
    _dvm = _get(cfg.nerf.train, "depth_valid_max", None)
    if _dvm is None:
        _dvm = _get(cfg.dataset, "depth_valid_max", None)
    depth_valid_max = float(_dvm) if _dvm is not None else None
    # RGB-first warmup: run the first N iterations WITHOUT the depth term,
    # then switch to the supervised step. Depth supervision applied from
    # iteration 0 can lock the white-background fog collapse in (measured
    # round 5: drums/materials train PSNR pinned ~9-12 dB under
    # --depth-loss 0.1 while the same recipe without it reaches ~30 dB;
    # the field must commit to surfaces photometrically before the depth
    # target is trustworthy to follow).
    depth_warmup_iters = int(
        depth_warmup
        if depth_warmup is not None
        else (_get(cfg.nerf.train, "depth_warmup", 0) or 0)
    )
    if depth_w <= 0.0:
        depth_warmup_iters = 0
    # -1 = AUTO: stay RGB-only until the train PSNR clears the fog band
    # (cfg.nerf.train.depth_warmup_psnr, default 14 dB — collapse pins
    # ~9-12, healthy escape passes 14 fast), checked at print cadence.
    # A fixed count needs per-scene tuning (materials' escape is later
    # than 1000); the threshold does not.
    warmup_auto = depth_warmup_iters < 0
    warmup_psnr = float(
        _get(cfg.nerf.train, "depth_warmup_psnr", 14.0) or 14.0
    )
    if depth_w > 0.0:
        if pose_opt:
            raise ValueError(
                "depth supervision and --pose-opt are mutually exclusive"
            )
        if supervision == "sg_ir":
            raise ValueError(
                "depth supervision and --sg-ir are mutually exclusive"
            )
        if scene.depths is None:
            raise ValueError(
                "depth_loss_weight > 0 but the dataset has no GT depth "
                "maps (messytable carries depthL.png / depth.png)"
            )
        if scene.use_ndc:
            raise ValueError(
                "depth supervision under NDC is unsupported: the render "
                "depth is an NDC ray parameter while depth sidecars are "
                "metric ray distance (see core.rays.ndc_t_to_world_depth)"
            )
    host_rows = host_depth = host_loader = host_tables = None
    if pose_opt:
        # camera-frame store: world rays are re-generated from the refined
        # poses inside the step (cache shards bake world rays and carry no
        # image structure, so the cache path does not apply here)
        from dexnerf_tpu.train.pose_opt import build_pose_ray_store

        store = build_pose_ray_store(
            scene.images[scene.i_train],
            scene.poses[scene.i_train],
            scene.hwf,
            float(cfg.dataset.near),
            float(cfg.dataset.far),
            intrinsics=(
                scene.intrinsics[scene.i_train]
                if scene.intrinsics is not None
                else None
            ),
            use_ndc=scene.use_ndc,
        )
    elif bool(_get(cfg.dataset, "host_store", False)):
        # Host-streaming data path (data/host_store.py): the packed rays
        # stay in host RAM and a prefetch thread ships each step's batch —
        # for captures whose ray store exceeds HBM. Built incrementally
        # (one image's bundle of device memory at a time). Takes
        # precedence over an offline cache: the explicit host_store says
        # the rays do NOT fit on-device, which the cache path would do.
        # dataset.host_wire: "packed" (default) ships u32 pixel indices +
        # u8 rgb and reconstructs rays in the jitted step (8x fewer wire
        # bytes); "rows" ships precomputed f32 ray rows.
        host_wire = str(_get(cfg.dataset, "host_wire", "packed"))
        if host_wire == "packed":
            from dexnerf_tpu.data.host_store import (
                build_pose_tables,
                images_to_u8,
            )

            host_rows = images_to_u8(scene.images[scene.i_train])
            host_tables = build_pose_tables(
                scene.poses[scene.i_train],
                scene.hwf,
                intrinsics=(
                    scene.intrinsics[scene.i_train]
                    if scene.intrinsics is not None
                    else None
                ),
                use_ndc=scene.use_ndc,
            )
            host_depth = (
                np.asarray(
                    scene.depths[scene.i_train], np.float32
                ).reshape(-1)
                if depth_w > 0.0 else None
            )
        elif host_wire == "rows":
            from dexnerf_tpu.data.host_store import build_host_ray_rows

            host_rows, host_depth = build_host_ray_rows(
                scene.images[scene.i_train],
                scene.poses[scene.i_train],
                scene.hwf,
                intrinsics=(
                    scene.intrinsics[scene.i_train]
                    if scene.intrinsics is not None
                    else None
                ),
                use_ndc=scene.use_ndc,
                depths=(
                    scene.depths[scene.i_train] if depth_w > 0.0 else None
                ),
            )
        else:
            raise ValueError(
                f"dataset.host_wire must be 'packed' or 'rows', got "
                f"{host_wire!r}"
            )
        store = None
    elif (
        cachedir
        and os.path.isdir(os.path.join(cachedir, "train"))
        and depth_w == 0.0  # cache shards carry no GT depth
    ):
        # Train from the offline ray cache when present (the reference's
        # USE_CACHED_DATASET preference, train_nerf_rgb.py:51-56).
        from dexnerf_tpu.data import build_ray_store_from_cache

        store = build_ray_store_from_cache(
            cachedir, float(cfg.dataset.near), float(cfg.dataset.far)
        )
    else:
        store = build_ray_store(
            scene.images[scene.i_train],
            scene.poses[scene.i_train],
            scene.hwf,
            float(cfg.dataset.near),
            float(cfg.dataset.far),
            intrinsics=(
                scene.intrinsics[scene.i_train]
                if scene.intrinsics is not None
                else None
            ),
            use_ndc=scene.use_ndc,
            depths=(
                scene.depths[scene.i_train] if depth_w > 0.0 else None
            ),
        )
    if host_rows is not None and num_devices is not None and num_devices > 1:
        raise ValueError(
            "dataset.host_store is a single-device data path (keep the "
            "store resident for data-parallel training, or scale scenes "
            "with apps.multiscene)"
        )

    # Occupancy-guided training (beyond parity; render/occupancy.py): bake
    # a σ-occupancy grid from the in-progress field periodically and
    # tighten every stored ray's [near, far] to its occupied span, so the
    # fixed per-ray sample budget lands where matter is.
    occ_sigma = float(
        occupancy
        if occupancy is not None
        else (_get(cfg.nerf.train, "occupancy", 0.0) or 0.0)
    )
    occ_rebake = None
    occ_every = 0
    occ_next = 0
    last_occ_frac: Optional[float] = None
    if occ_sigma > 0.0:
        if scene.use_ndc:
            raise ValueError(
                "occupancy-guided training is world-space; NDC (llff) "
                "scenes reparameterize the frustum — unsupported"
            )
        if pose_opt:
            raise ValueError(
                "occupancy-guided training and pose refinement are "
                "mutually exclusive (the pose store holds camera-frame "
                "rays whose world-space intervals move with the poses)"
            )
        if host_rows is not None:
            raise ValueError(
                "occupancy-guided training needs the device-resident ray "
                "store (dataset.host_store: false)"
            )
        from dexnerf_tpu.data.pipeline import with_full_intervals
        from dexnerf_tpu.render import make_mlp_field
        from dexnerf_tpu.render.occupancy import (
            build_occupancy_grid,
            tighten_store_intervals,
        )

        occ_next = int(_get(cfg.nerf.train, "occupancy_start_iter", 500))
        occ_every = int(_get(cfg.nerf.train, "occupancy_rebake_every", 1000))
        occ_res = int(_get(cfg.nerf.train, "occupancy_resolution", 128))
        occ_radius = float(_get(cfg.nerf.train, "occupancy_radius", 1.5))
        occ_center = tuple(
            float(c)
            for c in _get(cfg.nerf.train, "occupancy_center", (0.0,) * 3)
        )
        occ_dilate = int(_get(cfg.nerf.train, "occupancy_dilate", 1))
        occ_probes = int(_get(cfg.nerf.train, "occupancy_probes", 64))
        # install full-scalar intervals BEFORE the first step: the store's
        # pytree structure (and so the compiled train step) never changes
        # when the first bake swaps the values in — a mid-run retrace
        # costs minutes on the remote-TPU backend
        store = with_full_intervals(store)

        # the field closure is built ONCE: the bake's compiled lattice
        # evaluator is cached per field-function object (a fresh closure
        # per re-bake would recompile every time — minutes on the
        # remote-TPU backend)
        occ_use_fine = "fine" in params and fine_fn is not None
        occ_field = make_mlp_field(
            fine_fn if occ_use_fine else coarse_fn, s_train
        )

        def occ_rebake(params):
            grid = build_occupancy_grid(
                occ_field,
                params["fine" if occ_use_fine else "coarse"],
                sigma_threshold=occ_sigma,
                center=occ_center,
                radius=occ_radius,
                resolution=occ_res,
                dilate=occ_dilate,
            )
            iv = tighten_store_intervals(
                grid,
                store.data,
                store.near,
                store.far,
                num_probes=occ_probes,
            )
            return grid.occupancy_fraction(), iv
    # orthogonal step knobs, config keys with kwarg overrides
    # (reference-semantics sampling: train_nerf_rgb.py:222-241)
    sampling = sampling or str(_get(cfg.nerf.train, "sampling", "uniform"))
    steps_per_call = int(
        steps_per_call
        if steps_per_call is not None
        else _get(cfg.nerf.train, "steps_per_call", 1)
    )
    if pose_opt:
        fused_loss = None
    elif supervision == "sg_ir":
        from dexnerf_tpu.render.sg_ir import make_sg_ir_loss

        coarse_m, fine_m = models_from_cfg(cfg)
        fused_loss = make_sg_ir_loss(
            coarse_m, fine_m, s_train,
            distance_falloff=bool(
                _get(cfg.nerf.train, "sg_distance_falloff", True)
            ),
        )
    else:
        fused_loss = maybe_fused_loss(
            cfg, s_train, supervision,
            depth_loss_weight=depth_w, depth_valid_max=depth_valid_max,
        )
    # the combined loss kernel supersedes the separate field kernels
    coarse_field, fine_field = (
        (None, None) if fused_loss is not None
        else maybe_fused_fields(cfg, train=True)
    )

    mesh = None
    if pose_opt:
        if bool(_get(cfg.nerf, "use_pallas", False)):
            import warnings

            warnings.warn(
                "pose_opt needs ray-input gradients; the fused Pallas "
                "train kernels are bypassed (XLA path)",
                stacklevel=2,
            )
        if num_devices is not None and num_devices > 1:
            from dexnerf_tpu.parallel import (
                make_mesh,
                make_parallel_pose_train_step,
            )

            mesh = make_mesh(num_devices)
            train_step = make_parallel_pose_train_step(
                mesh, coarse_fn, fine_fn, tx, s_train, batch_size,
                supervision=supervision,
                sampling=sampling,
                steps_per_call=steps_per_call,
            )
        else:
            from dexnerf_tpu.train.pose_opt import make_pose_train_step

            train_step = make_pose_train_step(
                coarse_fn, fine_fn, tx, s_train, batch_size,
                supervision=supervision,
                sampling=sampling,
                steps_per_call=steps_per_call,
            )
    elif num_devices is not None and num_devices > 1:
        from dexnerf_tpu.parallel import make_mesh, make_parallel_train_step

        mesh = make_mesh(num_devices)
        train_step = make_parallel_train_step(
            mesh,
            coarse_fn,
            fine_fn,
            tx,
            s_train,
            batch_size,
            supervision=supervision,
            sampling=sampling,
            steps_per_call=steps_per_call,
            coarse_field=coarse_field,
            fine_field=fine_field,
            fused_loss=fused_loss,
            depth_loss_weight=depth_w,
            depth_valid_max=depth_valid_max,
        )
    elif host_rows is not None:
        # host-streaming path: sampling + gather on the host, one step
        # ahead of the device (data/host_store.py)
        if sampling != "uniform":
            raise ValueError(
                "dataset.host_store supports uniform sampling only "
                "(the loader draws uniform-over-all-rays batches)"
            )
        from dexnerf_tpu.train.step import make_batch_train_step

        if host_tables is not None:
            # packed wire: u32 indices + u8 rgb; rays reconstructed in
            # the jitted step from the pose table
            from dexnerf_tpu.data.host_store import (
                HostPixelLoader,
                make_ray_unpack,
            )

            host_loader = HostPixelLoader(
                host_rows,
                batch_size,
                seed,
                depth=host_depth if depth_w > 0.0 else None,
                prefetch=int(_get(cfg.dataset, "host_prefetch", 2) or 2),
            )
            _bstep = make_batch_train_step(
                coarse_fn, fine_fn, tx, s_train,
                supervision=supervision,
                coarse_field=coarse_field,
                fine_field=fine_field,
                fused_loss=fused_loss,
                depth_loss_weight=depth_w,
                depth_valid_max=depth_valid_max,
                unpack=make_ray_unpack(
                    host_tables,
                    float(cfg.dataset.near),
                    float(cfg.dataset.far),
                ),
            )

            def train_step(state, _store, key):
                keys = (
                    jax.random.split(key, steps_per_call)
                    if steps_per_call > 1
                    else [key]
                )
                for k in keys:
                    packed = next(host_loader)
                    state, metrics = _bstep(state, packed, k)
                return state, metrics
        else:
            from dexnerf_tpu.data.host_store import HostRayLoader

            host_loader = HostRayLoader(
                host_rows,
                float(cfg.dataset.near),
                float(cfg.dataset.far),
                batch_size,
                seed,
                depth=host_depth if depth_w > 0.0 else None,
                prefetch=int(_get(cfg.dataset, "host_prefetch", 2) or 2),
            )
            _bstep = make_batch_train_step(
                coarse_fn, fine_fn, tx, s_train,
                supervision=supervision,
                coarse_field=coarse_field,
                fine_field=fine_field,
                fused_loss=fused_loss,
                depth_loss_weight=depth_w,
                depth_valid_max=depth_valid_max,
            )

            def train_step(state, _store, key):
                keys = (
                    jax.random.split(key, steps_per_call)
                    if steps_per_call > 1
                    else [key]
                )
                for k in keys:
                    batch = next(host_loader)
                    state, metrics = _bstep(state, *batch[:2], k, *batch[2:])
                return state, metrics
    else:
        train_step = make_train_step(
            coarse_fn, fine_fn, tx, s_train, batch_size,
            supervision=supervision,
            coarse_field=coarse_field,
            fine_field=fine_field,
            fused_loss=fused_loss,
            sampling=sampling,
            steps_per_call=steps_per_call,
            depth_loss_weight=depth_w,
            depth_valid_max=depth_valid_max,
        )

    warmup_step = None
    if depth_warmup_iters != 0:
        if (
            host_rows is not None
            or pose_opt
            or (num_devices is not None and num_devices > 1)
        ):
            raise ValueError(
                "depth_warmup supports the single-device resident-store "
                "path (the distillation protocol)"
            )
        # the depth-free step is a separate compiled program (depth weight
        # is compile-time in the fused kernel); its program is the same
        # one every RGB-only run compiles, so it is cache-warm
        warm_fused = (
            None if fused_loss is None
            else maybe_fused_loss(cfg, s_train, supervision)
        )
        warmup_step = make_train_step(
            coarse_fn, fine_fn, tx, s_train, batch_size,
            supervision=supervision,
            coarse_field=coarse_field,
            fine_field=fine_field,
            fused_loss=warm_fused,
            sampling=sampling,
            steps_per_call=steps_per_call,
        )

    train_iters = (
        int(max_iters)
        if max_iters is not None
        else int(cfg.experiment.train_iters)
    )
    validate_every = int(_get(cfg.experiment, "validate_every", 0) or 0)
    save_every = int(_get(cfg.experiment, "save_every", 0) or 0)
    print_every = int(_get(cfg.experiment, "print_every", 100) or 100)

    # PRNG implementation for the step keys (cfg.nerf.rng_impl): "rbg"
    # uses the hardware RngBitGenerator — far cheaper random bits on TPU
    # than the default threefry (a different but statistically equivalent
    # draw stream; threefry stays the default for reference-comparable
    # trajectories)
    rng_impl = str(_get(cfg.nerf, "rng_impl", "threefry2x32"))
    if rng_impl != "threefry2x32":
        jax.config.update("jax_default_prng_impl", rng_impl)
    key = jax.random.PRNGKey(seed)
    t0 = time.time()
    rays_done = 0
    last_val: Dict[str, Any] = {}
    last_metrics: Dict[str, float] = {}
    ckpt_mngr: Optional[AsyncCheckpointManager] = None

    def _crosses(lo: int, hi: int, every: int) -> bool:
        """True when [lo, hi] contains a multiple of ``every`` (handles
        steps_per_call > 1, where several iterations land per dispatch)."""
        return every > 0 and (hi // every) > ((lo - 1) // every) if lo else True

    i = start_iter
    depth_on_step: Optional[int] = None  # auto-warmup switch point
    try:
        while i < train_iters:
            key, sub = jax.random.split(key)
            if warmup_step is None:
                step_fn = train_step
            elif warmup_auto:
                step_fn = train_step if depth_on_step is not None \
                    else warmup_step
            else:
                step_fn = (
                    warmup_step if i < depth_warmup_iters else train_step
                )
            state, metrics = step_fn(state, store, sub)
            last = min(i + steps_per_call, train_iters) - 1

            if occ_rebake is not None and last + 1 >= occ_next:
                frac, iv = occ_rebake(state.params)
                store = dc_replace(store, intervals=iv)
                occ_next = last + 1 + occ_every
                last_occ_frac = frac
                shrink = 1.0 - float(jnp.mean(iv[:, 1] - iv[:, 0])) / (
                    store.far - store.near
                )
                logger.scalars(
                    {
                        "train/occ_fraction": frac,
                        "train/occ_interval_shrink": shrink,
                    },
                    last,
                )

            if _crosses(i, last, print_every) or last == train_iters - 1:
                metrics = {k: float(v) for k, v in metrics.items()}
                last_metrics = metrics
                if (
                    warmup_auto
                    and depth_on_step is None
                    and metrics.get("psnr", 0.0) > warmup_psnr
                ):
                    depth_on_step = last + 1
                    logger.scalar("train/depth_on_step", depth_on_step,
                                  last)
                    print(
                        f"[depth warmup] train PSNR "
                        f"{metrics['psnr']:.1f} > {warmup_psnr:g} dB at "
                        f"iter {last}: depth supervision ON",
                        flush=True,
                    )
                logger.scalars(
                    {f"train/{k}": v for k, v in metrics.items()}, last
                )
                elapsed = time.time() - t0
                rays_done = (last - start_iter + 1) * batch_size
                logger.scalar(
                    "train/rays_per_sec", rays_done / max(elapsed, 1e-9), last
                )

            if validate_every and (
                _crosses(i, last, validate_every) or last == train_iters - 1
            ):
                # cycle through validation views (the reference picks a random
                # one each time, train_nerf_rgb.py:316-320)
                val_idx = int(
                    scene.i_val[(last // validate_every) % len(scene.i_val)]
                )
                val = validate(
                    coarse_fn,
                    fine_fn,
                    state.params,
                    scene,
                    cfg,
                    dex=dex,
                    supervision=supervision,
                    val_idx=val_idx,
                    mesh=mesh,
                )
                last_val = val
                _log_validation(
                    logger, val, last, logdir, save_artifacts=save_artifacts
                )

            if save_every and is_primary and last > 0 and (
                _crosses(i, last, save_every) or last == train_iters - 1
            ):
                # async manager: the array write overlaps the next train steps
                # (SURVEY §5; the reference's torch.save stalls its loop)
                if ckpt_mngr is None:
                    ckpt_mngr = AsyncCheckpointManager(
                        os.path.join(logdir, "checkpoints")
                    )
                ckpt_mngr.save(
                    last,
                    state,
                    extra={"loss": metrics.get("loss", 0.0)} if isinstance(metrics, dict) else None,
                )
            i = last + 1
    finally:
        # the prefetch worker (and its queued device batches) must not
        # outlive a failed run (host-streaming path)
        if host_loader is not None:
            host_loader.close()

    elapsed = time.time() - t0
    if ckpt_mngr is not None:
        ckpt_mngr.wait()
        ckpt_mngr.close()
    logger.close()
    extra: Dict[str, Any] = {}
    if last_occ_frac is not None:
        extra["occ_fraction"] = last_occ_frac
        extra["occ_interval_shrink"] = 1.0 - float(
            jnp.mean(store.intervals[:, 1] - store.intervals[:, 0])
        ) / (store.far - store.near)
    if pose_opt:
        from dexnerf_tpu.train.pose_opt import refined_c2w

        extra["refined_poses"] = np.asarray(
            refined_c2w(store.base_c2w, state.params["pose"])
        )
    if warmup_auto:
        extra["depth_on_step"] = depth_on_step
    return {
        **extra,
        "state": state,
        "final_train_metrics": last_metrics,
        "final_validation": last_val,
        "elapsed_sec": elapsed,
        "rays_per_sec": (train_iters - start_iter) * batch_size / max(elapsed, 1e-9),
        "logdir": logdir,
        "coarse_fn": coarse_fn,
        "fine_fn": fine_fn,
        "scene": scene,
    }
