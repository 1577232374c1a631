"""Occupancy-guided render A/B on a real trained checkpoint (TPU).

Loads a shipped pretrained scene (default lego-lowres), bakes σ
occupancy grids from the fine field at one or more thresholds, and
renders one full frame under several (interval, sample-budget)
configurations, reporting ms/frame, PSNR, and hit-pixel depth MAE
against a CONVERGED full-interval reference render (4x budget). The
claim under test: tightened intervals hold quality at a fraction of the
sample budget, while a naive budget cut without tightening loses it.

The occupancy grid is a jit ARGUMENT (OccupancyGrid is a pytree), so a
σ sweep reuses one compiled program per (budget, tightened?) pair.
Timing is chained through a data dependency and reported best-of-N
(CLAUDE.md timing rules).
"""

import argparse
import dataclasses
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--scene-dir",
        default="/root/reference/nerf-pytorch/pretrained/lego-lowres",
    )
    p.add_argument("--hw", type=int, default=400)
    p.add_argument("--focal", type=float, default=555.555)
    p.add_argument("--sigmas", type=float, nargs="+", default=[0.2],
                   help="occupancy bake thresholds to sweep (chip sweep: "
                   "0.2 gave 52.9 dB at 64+64 vs 44.4 @0.5 / 37.7 @2.0)")
    p.add_argument("--radius", type=float, default=1.3)
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--dilate", type=int, default=1)
    p.add_argument("--probes", type=int, default=128)
    p.add_argument("--block", type=int, default=8192)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--budgets", type=str, default="full,half,quarter",
                   help="comma list of full|half|quarter")
    p.add_argument("--fused-render", action="store_true",
                   help="run the fused Pallas render kernel path")
    p.add_argument("--platform", default=None, choices=("cpu", "tpu", "axon"))
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from dexnerf_tpu.config import load_config, render_settings_from_cfg
    from dexnerf_tpu.core.rays import get_ray_bundle_c2w
    from dexnerf_tpu.data.blender import spherical_render_poses
    from dexnerf_tpu.render import (
        build_occupancy_grid,
        make_mlp_field,
        render_image,
    )
    from dexnerf_tpu.train.loop import (
        load_eval_params,
        models_from_cfg,
        setup_models,
    )

    cfg = load_config(os.path.join(args.scene_dir, "config.yml"))
    ckpts = sorted(
        f for f in os.listdir(args.scene_dir) if f.endswith(".ckpt")
    )
    cfg, params, _, _ = load_eval_params(
        cfg, os.path.join(args.scene_dir, ckpts[-1])
    )
    coarse_fn, fine_fn, _ = setup_models(cfg, 1)
    s_base = render_settings_from_cfg(cfg, "validation").eval_variant()
    near, far = float(cfg.dataset.near), float(cfg.dataset.far)

    field = make_mlp_field(
        fine_fn if "fine" in params else coarse_fn, s_base
    )
    grids = {}
    for sig in args.sigmas:
        t0 = time.time()
        g = build_occupancy_grid(
            field,
            params.get("fine", params["coarse"]),
            sigma_threshold=sig,
            radius=args.radius,
            resolution=args.resolution,
            dilate=args.dilate,
        )
        jax.block_until_ready(g.occ)
        grids[sig] = g
        print(
            f"grid {args.resolution}^3 σ>{sig} baked in "
            f"{time.time() - t0:.1f}s — "
            f"{100 * g.occupancy_fraction():.1f}% occupied",
            flush=True,
        )

    H = W = args.hw
    pose = jnp.asarray(spherical_render_poses()[0][:4, :4], jnp.float32)

    def make_frame(samples, with_occ, use_impl=True):
        s = dataclasses.replace(
            s_base, num_coarse=samples[0], num_fine=samples[1]
        )
        impl = None
        if args.fused_render and use_impl:
            from dexnerf_tpu.ops import make_fused_render_rays

            cm, fm = models_from_cfg(cfg)
            impl = make_fused_render_rays(
                cm, fm, s, block_samples=args.block,
                compute_dtype=jnp.bfloat16,
                interpret=jax.default_backend() == "cpu",
            )

        @jax.jit
        def frame(pose, grid):
            ro, rd = get_ray_bundle_c2w(H, W, args.focal, pose)
            out = render_image(
                coarse_fn, fine_fn, params, ro, rd, near, far, s,
                block_size=args.block, rays_impl=impl,
                occupancy=grid if with_occ else None,
                occupancy_probes=args.probes,
            )
            r = out.fine if out.fine is not None else out.coarse
            return r.rgb, r.depth, r.accumulation

        return frame

    base_s = (s_base.num_coarse, s_base.num_fine)
    budget_map = {
        "full": base_s,
        "half": (base_s[0] // 2, base_s[1] // 2),
        "quarter": (base_s[0] // 4, base_s[1] // 4),
    }
    budgets = [budget_map[b] for b in args.budgets.split(",")]
    ref_s = (4 * base_s[0], 4 * base_s[1])
    first_sigma = args.sigmas[0]
    # quality reference: CONVERGED render (4x budget, full interval) via
    # XLA even under --fused-render (kernel untuned at 512 samples/ray;
    # XLA-vs-kernel rgb agreement ~62 dB, far above differences here)
    configs = [(f"ref  {ref_s[0]}+{ref_s[1]}", ref_s, None, False)]
    for b in budgets:
        configs.append((f"full {b[0]}+{b[1]}", b, None, True))
        for sig in args.sigmas:
            configs.append((f"occ(σ{sig:g}) {b[0]}+{b[1]}", b, sig, True))

    ref_rgb = ref_depth = ref_hit = None
    frames = {}
    for name, samples, sig, use_impl in configs:
        key = (samples, sig is not None, use_impl)
        if key not in frames:
            frames[key] = make_frame(samples, sig is not None, use_impl)
        frame = frames[key]
        grid = grids[sig] if sig is not None else None
        t0 = time.time()
        try:
            rgb, depth, acc = frame(pose, grid)
            jax.block_until_ready(rgb)
        except Exception as e:  # e.g. XLA scoped-vmem at corner shapes
            print(f"{name}: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]})", flush=True)
            continue
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.time()
            p2 = pose + 1e-12 * jnp.mean(rgb)
            rgb, depth, acc = frame(p2, grid)
            jax.block_until_ready(rgb)
            best = min(best, time.time() - t0)
        a = np.asarray(rgb)
        d = np.asarray(depth)
        if ref_rgb is None:
            ref_rgb, ref_depth = a, d
            ref_hit = np.asarray(acc) > 0.5
            q = "(reference)"
        else:
            mse = float(np.mean((a - ref_rgb) ** 2))
            dmae = float(np.abs(d - ref_depth)[ref_hit].mean())
            q = (f"{10 * np.log10(1.0 / mse):.1f} dB, "
                 f"depth MAE {dmae:.4f}")
        print(
            f"{name}: {best * 1e3:6.1f} ms/frame "
            f"({H * W / best / 1e3:5.0f} krays/s)  {q}  "
            f"[compile+first {compile_s:.1f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
