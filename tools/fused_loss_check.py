"""On-chip validation of the combined loss+gradients kernel
(``ops/fused_train_loss``): compiles the full hierarchical fused loss at
flagship scale and checks loss + every parameter gradient against autodiff
through the XLA path (same key => identical stratified/noise draws).

Stages: f32 (exactness), bf16 (the production dtype: bf16 dot operands,
f32 chain). Prints STAGE-<X>-OK with max relative grad error, or the
compile error.

Usage: python tools/fused_loss_check.py [--stages f32,bf16] [--block 512]
"""

import argparse
import os
import sys
import time
import traceback

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stages", type=str, default="f32,bf16")
    p.add_argument("--block", type=int, default=512)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--hidden", type=int, default=128,
                   help="MLP width (256 = paper-scale NeRF)")
    p.add_argument(
        "--ref-cache", type=str, default="/tmp/fused_loss_ref.npz",
        help="cache the (slow, ~7 min) XLA reference grads across runs",
    )
    p.add_argument(
        "--samples", type=int, nargs=2, default=(64, 64),
        metavar=("COARSE", "FINE"),
        help="sample counts (e.g. 64 128 = the hotdog config's S=192 "
        "fine pass; cache is keyed on non-default counts)",
    )
    p.add_argument(
        "--depth-weight", type=float, default=0.0,
        help="also supervise GT depth (the in-kernel depth term): both the "
        "XLA reference and the kernel add weight * masked depth MSE; "
        "switches the ref cache to <ref-cache>.depth.npz",
    )
    args = p.parse_args()
    if tuple(args.samples) != (64, 64) and args.ref_cache:
        args.ref_cache = (
        f"{args.ref_cache}.s{args.samples[0]}_{args.samples[1]}.npz"
        )
    if args.depth_weight > 0.0 and args.ref_cache:
        # key the cache on the WEIGHT too — stale grads for a different
        # weight would read as spurious kernel mismatches
        args.ref_cache = f"{args.ref_cache}.depth{args.depth_weight}.npz"

    from dexnerf_tpu.core.encoding import encoding_dim
    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.ops import make_fused_train_loss
    from dexnerf_tpu.render import RayBatch, RenderSettings, render_rays
    from dexnerf_tpu.train.step import nerf_loss

    enc_xyz, enc_dir = 10, 4
    model = FlexibleNeRFModel(
        num_layers=args.layers, hidden_size=args.hidden,
        skip_connect_every=3,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    settings = RenderSettings(
        num_coarse=int(args.samples[0]), num_fine=int(args.samples[1]),
        perturb=True,
        radiance_field_noise_std=0.2,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    in_dim = encoding_dim(3, enc_xyz) + encoding_dim(3, enc_dir)
    key = jax.random.PRNGKey(0)
    params = {
        "coarse": model.init(key, jnp.ones((1, in_dim))),
        "fine": model.init(jax.random.fold_in(key, 1), jnp.ones((1, in_dim))),
    }

    n = args.batch
    rd = jax.random.normal(jax.random.PRNGKey(3), (n, 3))
    rays = RayBatch(
        origins=jnp.zeros((n, 3)),
        directions=rd,
        viewdirs=rd / jnp.linalg.norm(rd, axis=-1, keepdims=True),
        near=jnp.full((n,), 2.0),
        far=jnp.full((n,), 6.0),
    )
    target = jax.random.uniform(jax.random.PRNGKey(4), (n, 3))
    render_key = jax.random.PRNGKey(7)
    depth_gt = None
    if args.depth_weight > 0.0:
        # mixed valid/invalid GT, like a real depth map with holes
        depth_gt = jnp.where(
            jax.random.uniform(jax.random.PRNGKey(5), (n,)) > 0.2,
            jax.random.uniform(
                jax.random.PRNGKey(6), (n,), minval=2.0, maxval=6.0
            ),
            0.0,
        )

    def xla_loss(p):
        result = render_rays(model.apply, model.apply, p, rays, render_key,
                             settings)
        loss, _ = nerf_loss(result, target)
        if depth_gt is not None:
            from dexnerf_tpu.train.step import masked_depth_mse

            loss = loss + args.depth_weight * masked_depth_mse(
                result.fine.depth, depth_gt
            )
        return loss

    t0 = time.time()
    leaves_tpl, treedef = jax.tree_util.tree_flatten(params)
    if args.ref_cache and os.path.exists(args.ref_cache):
        data = np.load(args.ref_cache)
        ref_loss = float(data["loss"])
        ref_grads = jax.tree_util.tree_unflatten(
            treedef, [data[f"g{i}"] for i in range(len(leaves_tpl))]
        )
        print(f"XLA ref loss={ref_loss:.6f} (cached)", flush=True)
    else:
        print("computing XLA reference grads...", flush=True)
        ref_loss, ref_grads = jax.jit(jax.value_and_grad(xla_loss))(params)
        ref_loss = float(ref_loss)
        ref_grads = jax.device_get(ref_grads)
        if args.ref_cache:
            gleaves = jax.tree_util.tree_leaves(ref_grads)
            np.savez(
                args.ref_cache, loss=ref_loss,
                **{f"g{i}": np.asarray(g) for i, g in enumerate(gleaves)},
            )
        print(
            f"XLA ref loss={ref_loss:.6f} ({time.time()-t0:.1f}s)", flush=True
        )

    for name in args.stages.split(","):
        name = name.strip()
        cd = jnp.float32 if name == "f32" else jnp.bfloat16
        t0 = time.time()
        try:
            fused = make_fused_train_loss(
                model, model, settings,
                block_samples=args.block, compute_dtype=cd, dw_dtype=cd,
                depth_loss_weight=args.depth_weight,
            )

            def floss(p):
                if depth_gt is not None:
                    loss, _ = fused(p, rays, target, render_key, depth_gt)
                else:
                    loss, _ = fused(p, rays, target, render_key)
                return loss

            loss, grads = jax.jit(jax.value_and_grad(floss))(params)
            loss = float(loss)
            grads = jax.device_get(grads)
            max_err = 0.0
            for (path, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(grads),
                jax.tree_util.tree_leaves_with_path(ref_grads),
            ):
                scale = max(np.abs(b).max(), 1e-8)
                err = np.abs(np.asarray(a) - np.asarray(b)).max() / scale
                max_err = max(max_err, float(err))
            print(
                f"STAGE-{name}-OK loss={loss:.6f} (ref {ref_loss:.6f}) "
                f"max_rel_grad_err={max_err:.3e} ({time.time()-t0:.1f}s)",
                flush=True,
            )
        except Exception:
            print(f"STAGE-{name}-FAILED ({time.time()-t0:.1f}s)", flush=True)
            traceback.print_exc()


if __name__ == "__main__":
    main()
