"""End-to-end learning check: fit the synthetic analytic scene on a real chip
and report holdout PSNR every 500 steps. Expect >25 dB by 3k iterations.

    python tools/convergence_check.py [--dtype bfloat16] [--iters 3000]

Used to validate quality parity of the bfloat16 compute path against the
float32 reference path (reference train quality is argued statistically —
SURVEY.md §7 "PRNG semantics"). ``tools/quality_guard.py`` wraps
:func:`run_convergence` with fixed-seed recorded bands per path.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time


def run_convergence(
    *,
    path: str = "xla",
    dtype: str = "float32",
    iters: int = 3000,
    seed: int = 0,
    batch: int = 1024,
    quiet: bool = False,
    samples: int = 32,
    occupancy: float = 0.0,
    occupancy_start: int = 500,
    occupancy_rebake: int = 500,
    scene: str = "default",
) -> float:
    """Train the synthetic scene through one compute path and return the
    final holdout PSNR (dB). ``path``: "xla" | "fused" (Pallas field
    kernels) | "fused_loss" (combined loss+gradients kernel).

    ``samples`` sets the per-pass budget (coarse == fine == samples;
    default 32+32 — the recorded quality bands' configuration).
    ``occupancy`` > 0 enables occupancy-guided training (σ threshold;
    grid re-baked from the in-progress fine field every
    ``occupancy_rebake`` iters after ``occupancy_start``) — the A/B is
    time-to-quality at a REDUCED ``samples`` vs the full-interval
    default budget.

    ``scene``: "default" (blobs spanning most of [2, 6] — cannot
    discriminate sample budgets; the quality-band scene) or "sparse"
    (small blobs in a wide [2, 10] — a reduced budget undersamples
    unless the intervals are tightened; the occupancy A/B scene)."""
    import jax
    import jax.numpy as jnp

    from dexnerf_tpu.core.encoding import encoding_dim
    from dexnerf_tpu.core.metrics import mse2psnr
    from dexnerf_tpu.core.rays import get_ray_bundle_c2w
    from dexnerf_tpu.data import build_ray_store, make_synthetic_scene
    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.render import RenderSettings, render_image
    from dexnerf_tpu.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    H = W = 64
    near, far = 2.0, 6.0
    scene_kwargs = {}
    occ_grid_radius = 2.5
    if scene == "sparse":
        from dexnerf_tpu.data.synthetic import SPARSE_SPHERES

        near, far = 2.0, 10.0
        scene_kwargs = dict(
            cam_radius=4.5, spheres=SPARSE_SPHERES, falloff=12.0,
            num_gt_samples=256, focal=2.0 * W,
        )
        # blobs + σ>0.2 tails fit in ~1.7 world units; 2.0 is conservative
        occ_grid_radius = 2.0
    elif scene != "default":
        raise ValueError(f"unknown scene {scene!r}")
    images, depths, poses, hwf = make_synthetic_scene(
        num_views=12, height=H, width=W, near=near, far=far, **scene_kwargs
    )
    test_img, test_pose = images[-1], poses[-1]
    enc_xyz, enc_dir = 6, 4
    settings = RenderSettings(
        num_coarse=int(samples), num_fine=int(samples), perturb=True,
        radiance_field_noise_std=0.0,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
        # the analytic GT composites on WHITE; the sparse scene is ~80%
        # background, so the training compositor must match it (the
        # default scene keeps False to preserve the recorded band
        # trajectories — its blobs dominate the frame and it converges
        # regardless)
        white_background=(scene == "sparse"),
    )
    model = FlexibleNeRFModel(
        num_layers=6, hidden_size=128, skip_connect_every=3,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
        dtype=dtype,
    )
    in_dim = encoding_dim(3, enc_xyz) + encoding_dim(3, enc_dir)
    key = jax.random.PRNGKey(seed)
    params = {
        "coarse": model.init(key, jnp.ones((1, in_dim))),
        "fine": model.init(jax.random.fold_in(key, 1), jnp.ones((1, in_dim))),
    }
    store = build_ray_store(images[:-1], poses[:-1], hwf, near, far)
    tx = make_optimizer(5e-3, lr_decay=50, lr_decay_factor=0.1)
    state = init_train_state(params, tx)
    cf = ff = None
    if path == "fused":
        from dexnerf_tpu.ops import make_fused_flexible_field_train

        def fused_field():
            return make_fused_flexible_field_train(
                model,
                block_samples=1024,
                block_samples_bwd=1024,
                compute_dtype=jnp.bfloat16,
                dw_dtype=jnp.bfloat16,
            )

        cf, ff = fused_field(), fused_field()
    fused_loss = None
    if path == "fused_loss":
        from dexnerf_tpu.ops import make_fused_train_loss

        fused_loss = make_fused_train_loss(
            model, model, settings,
            block_samples=8192,
            compute_dtype=jnp.bfloat16,
            dw_dtype=jnp.bfloat16,
        )
    step = make_train_step(
        model.apply, model.apply, tx, settings, batch,
        coarse_field=cf, fine_field=ff, fused_loss=fused_loss,
    )
    occ_rebake = None
    occ_grid = None  # latest baked grid; also tightens the holdout render
    if occupancy > 0.0:
        from dexnerf_tpu.data import with_full_intervals
        from dexnerf_tpu.render import build_occupancy_grid, make_mlp_field
        from dexnerf_tpu.render.occupancy import tighten_store_intervals

        store = with_full_intervals(store)
        occ_field = make_mlp_field(model.apply, settings)

        def occ_rebake(params):
            # grid radius must cover the blobs' σ > threshold TAILS
            # (default scene: ~2.3 from the origin at sigmoid-8 falloff)
            # — a grid cube that clips real matter BIASES training,
            # exactly like the render-side fringe finding (PERF_NOTES)
            grid = build_occupancy_grid(
                occ_field, params["fine"],
                sigma_threshold=float(occupancy), radius=occ_grid_radius,
                resolution=64, dilate=1,
            )
            iv = tighten_store_intervals(
                grid, store.data, store.near, store.far, num_probes=64
            )
            return grid, iv

    t0 = time.time()
    final_psnr = 0.0
    for i in range(iters + 1):
        key, sub = jax.random.split(key)
        state, metrics = step(state, store, sub)
        if (
            occ_rebake is not None
            and i >= occupancy_start
            and (i - occupancy_start) % occupancy_rebake == 0
        ):
            import dataclasses

            occ_grid, iv = occ_rebake(state.params)
            frac = occ_grid.occupancy_fraction()
            store = dataclasses.replace(store, intervals=iv)
            if not quiet:
                shrink = 1.0 - float(jnp.mean(iv[:, 1] - iv[:, 0])) / (
                    store.far - store.near
                )
                print(
                    f"iter {i}: occupancy re-bake — {100 * frac:.1f}% "
                    f"occupied, mean interval shrink {100 * shrink:.1f}%",
                    flush=True,
                )
        if i % 500 == 0 or i == iters:
            ro, rd = get_ray_bundle_c2w(H, W, hwf[2], jnp.asarray(test_pose))
            # holdout renders always at a FIXED reference budget (32+32
            # default scene, 64+64 sparse — its wide interval needs more)
            # so a reduced TRAIN budget (--samples, the occupancy A/B) is
            # scored on field quality, not on eval sample count
            eval_nc = 64 if scene == "sparse" else 32
            eval_settings = settings.eval_variant()
            if int(samples) != eval_nc:
                import dataclasses as _dc

                eval_settings = _dc.replace(
                    eval_settings, num_coarse=eval_nc, num_fine=eval_nc
                )
            # occupancy-trained fields are UNSUPERVISED outside their
            # tightened intervals (no sample ever lands there), so the
            # holdout render tightens with the same grid — exactly how the
            # product renders such a checkpoint (apps.eval --occupancy)
            out = render_image(
                model.apply, model.apply, state.params, ro, rd, near, far,
                eval_settings, block_size=4096,
                occupancy=occ_grid,
            )
            mse = float(jnp.mean((out.fine.rgb - jnp.asarray(test_img)) ** 2))
            final_psnr = mse2psnr(mse)
            if not quiet or i == iters:
                print(
                    f"iter {i}: train_psnr {float(metrics['psnr']):.2f} "
                    f"holdout_psnr {final_psnr:.2f} "
                    f"({time.time()-t0:.0f}s, path={path}, dtype={dtype})",
                    flush=True,
                )
    return final_psnr


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--iters", type=int, default=3000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument(
        "--fused",
        action="store_true",
        help="train through the fused Pallas field (bf16 operands, f32 "
        "chain) instead of the XLA field — quality-parity check for the "
        "kernel path",
    )
    p.add_argument(
        "--fused-loss",
        action="store_true",
        help="train through the combined loss+gradients kernel "
        "(ops/fused_train_loss) — quality-parity check for the "
        "single-program fwd+bwd path",
    )
    p.add_argument(
        "--samples", type=int, default=32,
        help="per-pass sample budget (coarse == fine == SAMPLES)",
    )
    p.add_argument(
        "--occupancy", type=float, default=0.0, metavar="SIGMA",
        help="occupancy-guided training: σ threshold for the periodic "
        "grid re-bake + store interval tightening (0 = off); A/B "
        "time-to-quality against the full-interval default at a "
        "reduced --samples",
    )
    p.add_argument(
        "--scene", default="default", choices=["default", "sparse"],
        help="'sparse' = small blobs in a wide [2, 10] interval, where a "
        "reduced sample budget undersamples unless occupancy-tightened "
        "(the occupancy A/B scene)",
    )
    args = p.parse_args()

    path = (
        "fused_loss" if args.fused_loss else ("fused" if args.fused else "xla")
    )
    psnr = run_convergence(
        path=path, dtype=args.dtype, iters=args.iters, seed=args.seed,
        batch=args.batch, samples=args.samples, occupancy=args.occupancy,
        scene=args.scene,
    )
    print(f"DONE holdout_psnr={psnr:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
