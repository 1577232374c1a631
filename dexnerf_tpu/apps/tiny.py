"""Tiny-NeRF teaching pipeline (reference ``tiny_nerf.py``).

A self-contained, coarse-only NeRF: uniform depth samples with jitter (no
hierarchy), a 3-layer MLP over position encodings, Adam at 5e-3 — trained on
either the classic ``tiny_nerf_data.npz`` (100x100 lego; pass ``--data``) or,
when absent, on a procedurally generated synthetic scene so the demo is
hermetic. Plots/PSNR snapshots go to ``--outdir``.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", type=str, default="",
                   help="path to tiny_nerf_data.npz (optional)")
    p.add_argument("--outdir", type=str, default="tiny_nerf_out")
    p.add_argument("--iters", type=int, default=1000)
    p.add_argument("--num-samples", type=int, default=32)
    p.add_argument("--batch-rays", type=int, default=1024)
    p.add_argument("--display-every", type=int, default=100)
    p.add_argument(
        "--platform",
        type=str,
        default=None,
        choices=("cpu", "tpu", "axon"),
        help="force a JAX platform (e.g. cpu when the TPU tunnel is "
        "unavailable); overrides the environment's pinned default",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dexnerf_tpu.core.encoding import encoding_dim
    from dexnerf_tpu.data import build_ray_store, make_synthetic_scene
    from dexnerf_tpu.models import VeryTinyNeRFModel
    from dexnerf_tpu.render import RenderSettings, render_image
    from dexnerf_tpu.train import init_train_state, make_optimizer, make_train_step
    from dexnerf_tpu.core.rays import get_ray_bundle_c2w
    from dexnerf_tpu.core.metrics import mse2psnr

    if args.data and os.path.exists(args.data):
        z = np.load(args.data)
        images = z["images"].astype(np.float32)
        poses = z["poses"].astype(np.float32)
        focal = float(z["focal"])
        H, W = images.shape[1:3]
        hwf = [H, W, focal]
        near, far = 2.0, 6.0
    else:
        images, _, poses, hwf = make_synthetic_scene(
            num_views=16, height=64, width=64
        )
        near, far = 2.0, 6.0
        H, W, focal = hwf

    # hold out the last view
    train_imgs, train_poses = images[:-1], poses[:-1]
    test_img, test_pose = images[-1], poses[-1]

    enc = 6
    settings = RenderSettings(
        num_coarse=args.num_samples,
        num_fine=0,
        perturb=True,
        num_encoding_fn_xyz=enc,
        num_encoding_fn_dir=enc,
        include_input_xyz=True,
        include_input_dir=True,
    )
    model = VeryTinyNeRFModel(num_encoding_functions=enc)
    in_dim = 2 * encoding_dim(3, enc)
    key = jax.random.PRNGKey(0)
    params = {"coarse": model.init(key, jnp.ones((1, in_dim)))}

    store = build_ray_store(train_imgs, train_poses, hwf, near, far)
    tx = make_optimizer(5e-3, lr_decay=250, lr_decay_factor=0.1)
    state = init_train_state(params, tx)
    step = make_train_step(model.apply, None, tx, settings, args.batch_rays)

    os.makedirs(args.outdir, exist_ok=True)
    psnrs = []
    t0 = time.time()
    for i in range(args.iters):
        key, sub = jax.random.split(key)
        state, metrics = step(state, store, sub)
        if i % args.display_every == 0 or i == args.iters - 1:
            ro, rd = get_ray_bundle_c2w(H, W, focal, jnp.asarray(test_pose))
            out = render_image(
                model.apply, None, state.params, ro, rd, near, far,
                settings.eval_variant(),
            )
            mse = float(jnp.mean((out.coarse.rgb - jnp.asarray(test_img)) ** 2))
            psnr = mse2psnr(mse)
            psnrs.append((i, psnr))
            print(f"iter {i}: train loss {float(metrics['loss']):.4f}, "
                  f"holdout PSNR {psnr:.2f} ({time.time()-t0:.1f}s)")
            import imageio.v2 as imageio

            imageio.imwrite(
                os.path.join(args.outdir, f"render_{i:05d}.png"),
                (np.clip(np.asarray(out.coarse.rgb), 0, 1) * 255).astype(np.uint8),
            )
            _save_snapshot(
                os.path.join(args.outdir, f"snapshot_{i:05d}.png"),
                np.asarray(out.coarse.rgb),
                psnrs,
            )
    np.savetxt(os.path.join(args.outdir, "psnr.txt"), np.asarray(psnrs))
    return 0


def _save_snapshot(path: str, rgb: np.ndarray, psnrs) -> None:
    """The reference's matplotlib snapshot: held-out render next to the
    PSNR curve (``tiny_nerf.py:302-332``). Soft dependency — skipped
    silently when matplotlib is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # pragma: no cover - matplotlib is in the image
        return
    arr = np.asarray(psnrs, dtype=np.float64).reshape(-1, 2)
    fig, (ax_img, ax_psnr) = plt.subplots(1, 2, figsize=(9, 4))
    ax_img.imshow(np.clip(rgb, 0, 1))
    ax_img.set_title(f"iter {int(arr[-1, 0])}")
    ax_img.axis("off")
    ax_psnr.plot(arr[:, 0], arr[:, 1])
    ax_psnr.set_title("holdout PSNR")
    ax_psnr.set_xlabel("iteration")
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


if __name__ == "__main__":
    raise SystemExit(main())
