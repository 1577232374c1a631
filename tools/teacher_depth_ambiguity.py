"""Is the distillation depth GT itself ambiguous? Teacher self-diagnosis.

docs/DISTILL_BENCH.json scores the distilled student's EXPECTED depth
against the TEACHER's expected-depth sidecars. hotdog reads 2179 mm while
its RGB is near-perfect (36.6 dB) and docs/DISTILL_TAIL.json shows the
error is broad-interior, not a mask/edge artifact. The hypothesis
(README): a shape-radiance ambiguity on the textureless white plate —
alpha-composited expected depth is unconstrained by RGB there, so BOTH
fields' expected depths are fog reads and their disagreement measures
nothing about geometry.

This tool tests that hypothesis on the TEACHER ALONE, no student needed:
render the shipped reference checkpoint's expected depth AND its
σ-threshold (Dex-NeRF) depth sweep on test-protocol poses, then measure,
over acc≥0.5 pixels,

  * ``plateau_mm``      — median |dex(m) − dex(m')| across the mid-grid:
                          how stable the σ-surface is (sharp field ⇒ mm);
  * ``exp_vs_dex_mm``   — median |expected − dex(m*)| at the
                          best-agreeing threshold m*;
  * ``exp_behind_frac`` — fraction of pixels where expected depth sits
                          >100 mm BEHIND the σ-surface (the fog-bias
                          signature: mass bleeding toward the far plane).

If the teacher's own expected depth disagrees with its own stable
σ-surface by meters (hotdog) while a control scene (lego) agrees to mm,
the 2179 mm row is a GT-side property of expected depth on that scene —
exactly the failure mode the namesake σ-threshold method exists to fix
(reference ``volume_rendering_utils.py:51-58``).

    python tools/teacher_depth_ambiguity.py --scenes hotdog lego   # TPU ~8 min

Writes docs/TEACHER_DEPTH_AMBIGUITY.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRETRAINED = "/root/reference/nerf-pytorch/pretrained"


def latest_ckpt(scene: str) -> str:
    d = os.path.join(PRETRAINED, f"{scene}-lowres")
    cks = sorted(f for f in os.listdir(d) if f.endswith(".ckpt"))
    return os.path.join(d, cks[-1])


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scenes", nargs="+", default=["hotdog", "lego"])
    p.add_argument("--hwf", type=float, nargs=3, default=(400, 400, 555.555))
    p.add_argument("--poses", type=int, default=3)
    p.add_argument("--m-max", type=float, default=80.0)
    p.add_argument("--out", default=os.path.join(
        REPO, "docs", "TEACHER_DEPTH_AMBIGUITY.json"))
    p.add_argument("--platform", default=None, choices=("cpu", "tpu", "axon"))
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from dexnerf_tpu.config import load_config, render_settings_from_cfg
    from dexnerf_tpu.core.rays import get_ray_bundle_c2w
    from dexnerf_tpu.data.blender import pose_spherical
    from dexnerf_tpu.render import render_image
    from dexnerf_tpu.train.loop import (
        load_eval_params,
        maybe_fused_render_impl,
        setup_models,
    )

    H, W, focal = int(args.hwf[0]), int(args.hwf[1]), float(args.hwf[2])
    # the reference's own sweep grid: arange(5, m_thres+5, 5)
    # (train_dexnerf_rgb.py:153-154)
    m_grid = tuple(float(m) for m in np.arange(5.0, args.m_max + 5.0, 5.0))
    # the plateau-stability read spans thresholds 20..60; a narrower
    # --m-max would silently index an empty mid-grid below
    if not any(20.0 <= m <= 60.0 for m in m_grid):
        raise SystemExit(
            f"--m-max {args.m_max:g} leaves no thresholds in the 20..60 "
            "plateau window — use --m-max >= 20"
        )

    report = {}
    for scene in args.scenes:
        cfg = load_config(os.path.join(PRETRAINED, f"{scene}-lowres",
                                       "config.yml"))
        cfg, params, _, _ = load_eval_params(cfg, latest_ckpt(scene))
        coarse_fn, fine_fn, _ = setup_models(cfg, 0)
        s_val = render_settings_from_cfg(cfg, "validation").eval_variant()
        s_val = dataclasses.replace(s_val, m_thres_cand=m_grid)
        rays_impl = maybe_fused_render_impl(cfg, s_val)
        near, far = float(cfg.dataset.near), float(cfg.dataset.far)

        if fine_fn is None:
            raise SystemExit(
                f"{scene}: coarse-only checkpoint — σ-threshold depth "
                "rides the fine pass (reference semantics); this probe "
                "needs a hierarchical model"
            )

        @jax.jit
        def render_frame(pose):
            ro, rd = get_ray_bundle_c2w(H, W, focal, pose)
            out = render_image(
                coarse_fn, fine_fn, params, ro, rd, near, far, s_val,
                rays_impl=rays_impl, height=H, width=W, focal_length=focal,
            )
            r = out.fine
            if r is None or r.depth_dex is None:
                raise SystemExit(
                    f"{scene}: render produced no fine-pass σ-threshold "
                    "depth (check nerf.validation.num_fine > 0)"
                )
            return r.depth, r.depth_dex, r.accumulation

        # the generator's test-split protocol poses (held-out azimuths,
        # mid-elevation, radius 4.0 — make_dataset_from_ckpt defaults)
        thetas = np.linspace(0.0, 360.0, args.poses, endpoint=False) + 25.0
        exp_l, dex_l, acc_l = [], [], []
        for th in thetas:
            pose = jnp.asarray(
                np.asarray(pose_spherical(th, -35.0, 4.0), np.float32))
            d_exp, d_dex, acc = render_frame(pose)
            exp_l.append(np.asarray(d_exp, np.float64))
            dex_l.append(np.asarray(d_dex, np.float64))
            acc_l.append(np.asarray(acc, np.float64))
        exp = np.stack(exp_l)                    # [P, H, W]
        dex = np.stack(dex_l, axis=1)            # [T, P, H, W]
        hit = np.stack(acc_l) >= 0.5             # [P, H, W]

        n_hit = int(hit.sum())
        # σ-surface stability across the mid-grid (indices of 20..60)
        mid = [i for i, m in enumerate(m_grid) if 20.0 <= m <= 60.0]
        if not mid:
            raise SystemExit(
                "--m-max too small: the 20..60 plateau window is empty, "
                "so σ-surface stability cannot be measured")
        spread = np.abs(dex[mid[-1]] - dex[mid[0]])
        plateau_mm = float(np.median(spread[hit]) * 1000.0)
        # expected-vs-dex agreement at the best threshold
        per_m = [float(np.median(np.abs(exp - dex[t])[hit]) * 1000.0)
                 for t in range(len(m_grid))]
        best = int(np.argmin(per_m))
        # fog-bias signature: expected sits behind the σ-surface
        signed = (exp - dex[best])[hit] * 1000.0
        report[scene] = {
            "checkpoint": os.path.basename(latest_ckpt(scene)),
            "poses": int(args.poses),
            "hit_px": n_hit,
            "hit_frac": round(n_hit / hit.size, 4),
            "plateau_mm": round(plateau_mm, 1),
            "best_m": m_grid[best],
            # argmin landing on the grid boundary means the true optimum
            # may lie outside the sweep (per_m was still decreasing at
            # m_max on both committed scenes) — flag it so best_m is read
            # as grid-clamped, not an interior optimum
            "best_m_grid_clamped": best in (0, len(m_grid) - 1),
            "exp_vs_dex_mm": round(per_m[best], 1),
            "exp_vs_dex_mean_mm": round(
                float(np.mean(np.abs(signed))), 1),
            "exp_behind_frac_100mm": round(
                float(np.mean(signed > 100.0)), 4),
            "exp_ahead_frac_100mm": round(
                float(np.mean(signed < -100.0)), 4),
            "per_m_median_mm": {str(m): round(v, 1)
                                for m, v in zip(m_grid, per_m)},
        }
        print(scene, json.dumps(report[scene], indent=1), flush=True)

    sus = {s: r for s, r in report.items() if r["exp_vs_dex_mm"] > 300.0}
    report["verdict"] = (
        ("expected depth disagrees with the teacher's own stable σ-surface "
         f"by >0.3 m on: {sorted(sus)} — the expected-depth GT sidecar is "
         "the ambiguous quantity on those scenes; σ-threshold depth is the "
         "trustworthy read (the namesake method's point)")
        if sus else
        "teacher expected depth agrees with its σ-surface on all scenes"
    )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(report, f, indent=1)
    os.replace(tmp, args.out)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
