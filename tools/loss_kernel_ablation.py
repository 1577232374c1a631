"""Bisect where the combined loss+grads kernel's time goes (on chip).

Times ONE fused pass (``make_fused_pass_loss``) — not the full train step —
under progressively ablated kernels (``_make_loss_kernel(ablate=...)``):

  full         everything (production kernel)
  cheap_coords full, but the exact 2-pass coordinate dots run single-pass
               (measures the value-exactness tax)
  no_bwd       forward + compositing + loss only (bwd chain cost = full - this)
  no_comp      forward MLP + PE + coords only (compositing = no_bwd - this)
  mlp_only     forward MLP on an iota input (PE+coords = no_comp - this)

Timing chained through a data dependency (origins += 0*loss) per CLAUDE.md;
best-of-N blocks. Outputs of ablated kernels are numerically wrong on
purpose — this tool is timing-only.
"""

import argparse
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--modes", type=str,
                   default="full,no_bwd,no_comp,mlp_only,cheap_coords")
    p.add_argument("--rays", type=int, default=16384)
    p.add_argument("--samples", type=int, default=64)
    p.add_argument("--block", type=int, default=8192)
    p.add_argument("--parts", type=int, default=8)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.ops.fused_train_loss import make_fused_pass_loss

    enc_xyz, enc_dir = 10, 4
    model = FlexibleNeRFModel(
        num_layers=8, hidden_size=args.hidden, skip_connect_every=3,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    from dexnerf_tpu.core.encoding import encoding_dim

    in_dim = encoding_dim(3, enc_xyz) + encoding_dim(3, enc_dir)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, in_dim)))

    N, S = args.rays, args.samples
    rng = np.random.RandomState(0)
    origins = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    dirs = rng.randn(N, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    directions = jnp.asarray(dirs)
    z = jnp.asarray(
        np.sort(rng.uniform(2.0, 6.0, (N, S)).astype(np.float32), axis=1)
    )
    dists = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full((N, 1), 1e10)], axis=1
    )
    noise = jnp.asarray(0.2 * rng.randn(N, S).astype(np.float32))
    target = jnp.asarray(rng.rand(N, 3).astype(np.float32))

    for mode in args.modes.split(","):
        mode = mode.strip()
        passfn = make_fused_pass_loss(
            model,
            block_samples=args.block,
            compute_dtype=jnp.bfloat16,
            dw_dtype=jnp.bfloat16,
            parts=args.parts,
            ablate=None if mode == "full" else mode,
        )

        @jax.jit
        def run(o):
            loss, w, rgb = passfn(
                params, o, directions, z, directions, dists, noise, target
            )
            # data dependency: next call's origins depend on this loss
            return o + 0.0 * loss, loss

        print(f"--- {mode}: compiling...", flush=True)
        try:
            o = origins
            t0 = time.time()
            o, loss = run(o)
            jax.block_until_ready(o)
            print(f"    compile+first: {time.time()-t0:.1f} s", flush=True)
            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.time()
                for _ in range(args.steps):
                    o, loss = run(o)
                jax.block_until_ready(o)
                best = min(best, (time.time() - t0) / args.steps)
            print(
                f"RESULT {mode}: {best*1e3:.2f} ms/pass "
                f"({N/best:.0f} rays/s single-pass) loss={float(loss):.3g}",
                flush=True,
            )
        except Exception as e:
            print(f"RESULT {mode}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
