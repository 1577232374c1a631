"""Full-frame render throughput (rays/s/chip) on the flagship model.

The BASELINE metric of record is "rays/sec/chip (train + render)"; bench.py
covers train, this covers render: a full hierarchical render_image pass
(stratified sampling -> coarse field -> compositing -> sample_pdf -> fine
field -> compositing) over a lego-scale 400x400 frame, deterministic
validation settings. Reference point: eval_nerf.py prints seconds/image on
the 2080 Ti ("<1 s ... ~30 s", README:59).

Iterations are chained through a data dependency and timed best-of-N
(CLAUDE.md timing rules).
"""

import argparse
import functools
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--hw", type=int, default=400)
    p.add_argument("--block", type=int, default=8192)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--fused", action="store_true",
                   help="render through the fused Pallas field")
    p.add_argument("--fused-render", action="store_true",
                   help="render through the FULLY fused "
                   "PE->MLP->compositing kernel (rays_impl)")
    p.add_argument("--kernel-block", type=int, default=8192,
                   help="Pallas block_samples for the fused paths "
                   "(8192 measured fastest: 202.6 ms vs 215.7 at 1024)")
    p.add_argument("--compare", action="store_true",
                   help="render the SAME frame through XLA and the fused "
                   "render kernel (with dex thresholds) and report value "
                   "agreement instead of throughput")
    args = p.parse_args()

    from dexnerf_tpu.core.encoding import encoding_dim
    from dexnerf_tpu.core.rays import get_ray_bundle_c2w
    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.render import RenderSettings, render_image

    enc_xyz, enc_dir = 10, 4
    settings = RenderSettings(
        num_coarse=64, num_fine=64, perturb=False,
        radiance_field_noise_std=0.0,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    model = FlexibleNeRFModel(
        num_layers=8, hidden_size=128, skip_connect_every=3,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    in_dim = encoding_dim(3, enc_xyz) + encoding_dim(3, enc_dir)
    key = jax.random.PRNGKey(0)
    params = {
        "coarse": model.init(key, jnp.ones((1, in_dim))),
        "fine": model.init(jax.random.fold_in(key, 1), jnp.ones((1, in_dim))),
    }
    cf = ff = None
    rays_impl = None
    if args.fused:
        from dexnerf_tpu.ops import make_fused_flexible_field

        cf = make_fused_flexible_field(
            model, block_samples=args.kernel_block,
            compute_dtype=jnp.bfloat16,
        )
        ff = cf
    if args.fused_render:
        from dexnerf_tpu.ops import make_fused_render_rays

        rays_impl = make_fused_render_rays(
            model, model, settings, block_samples=args.kernel_block,
            compute_dtype=jnp.bfloat16,
        )

    H = W = args.hw
    pose = jnp.eye(4).at[2, 3].set(4.0)

    if args.compare:
        # chip value-parity: XLA compositor vs the fused render kernel on
        # one identical frame, including the dex-depth threshold outputs
        import dataclasses

        import numpy as np

        from dexnerf_tpu.ops import make_fused_render_rays

        s_cmp = dataclasses.replace(
            settings, m_thres_cand=(5.0, 15.0, 40.0)
        )
        impl = make_fused_render_rays(
            model, model, s_cmp, block_samples=args.kernel_block,
            compute_dtype=jnp.bfloat16,
        )

        @functools.partial(jax.jit, static_argnums=(0,))
        def frame(rays_kind):
            ro, rd = get_ray_bundle_c2w(H, W, 555.0, pose)
            out = render_image(
                model.apply, model.apply, params, ro, rd, 2.0, 6.0,
                s_cmp, block_size=args.block,
                rays_impl=impl if rays_kind else None,
            )
            return out.fine.rgb, out.fine.depth, out.fine.depth_dex

        ref = [np.asarray(x) for x in frame(False)]
        fus = [np.asarray(x) for x in frame(True)]
        for name, a, b in zip(("rgb", "depth", "depth_dex"), ref, fus):
            d = np.abs(a - b)
            mse = float(np.mean((a - b) ** 2))
            psnr = 10 * np.log10(1.0 / mse) if mse > 0 else float("inf")
            print(
                f"COMPARE {name}: max|diff|={d.max():.3e} "
                f"mean|diff|={d.mean():.3e} psnr={psnr:.1f} dB",
                flush=True,
            )
        return

    @jax.jit
    def render_frame(pose):
        ro, rd = get_ray_bundle_c2w(H, W, 555.0, pose)
        out = render_image(
            model.apply, model.apply, params, ro, rd, 2.0, 6.0,
            settings, block_size=args.block,
            coarse_field=cf, fine_field=ff, rays_impl=rays_impl,
        )
        return out.fine.rgb

    # warmup/compile
    rgb = render_frame(pose)
    jax.block_until_ready(rgb)
    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.time()
        # chain: next pose depends on previous output
        p2 = pose + 1e-12 * jnp.mean(rgb)
        rgb = render_frame(p2)
        jax.block_until_ready(rgb)
        best = min(best, time.time() - t0)
    rays = H * W
    mode = (
        "fused-render" if args.fused_render
        else ("fused-field" if args.fused else "xla")
    )
    print(
        f"RESULT render {H}x{W} ({mode}): "
        f"{best*1e3:.1f} ms/frame, {rays/best/1e3:.0f} krays/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
