"""On-chip validation of the bf16 fused train field (round-2 kernel work).

Round 1 blocker: the bf16 backward kernel crashed the Mosaic remote
compiler at every block size; the bisection isolated bf16 where/astype
delta-mask chains. Round-2 fix: the whole chain is f32 and bf16 touches
only dot operands. This script compiles + grad-checks the fused field on
the real chip:

  stage A: compute_dtype=bf16, dw_dtype=f32  (safe dW form)
  stage B: compute_dtype=bf16, dw_dtype=bf16 (faster dW if Mosaic takes it)

Each stage prints STAGE-<X>-OK with the max relative grad error vs the XLA
autodiff path, or the compile error.

Usage: python tools/fused_bf16_check.py [--stages A,B] [--block 512]
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
    p.add_argument("--stages", type=str, default="A,B")
    p.add_argument("--block", type=int, default=512)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--samples", type=int, default=64)
    args = p.parse_args()

    from dexnerf_tpu.core.encoding import encoding_dim
    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.ops import make_fused_flexible_field_train
    from dexnerf_tpu.render.renderer import RenderSettings, make_mlp_field

    enc_xyz, enc_dir = 10, 4
    model = FlexibleNeRFModel(
        num_layers=8, hidden_size=128, skip_connect_every=3,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    in_dim = encoding_dim(3, enc_xyz) + encoding_dim(3, enc_dir)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.ones((1, in_dim)))
    N, S = args.batch, args.samples
    pts = jax.random.normal(jax.random.fold_in(key, 1), (N, S, 3))
    dirs = jax.random.normal(jax.random.fold_in(key, 2), (N, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    # a generic, well-scaled cotangent via a scalar loss
    settings = RenderSettings(
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir
    )
    xla_field = make_mlp_field(model.apply, settings)

    def loss_with(field, p):
        raw = field(p, pts, dirs)
        return jnp.mean(jnp.tanh(raw) ** 2)

    print("computing XLA reference grads...", flush=True)
    t0 = time.time()
    ref_loss, ref_grads = jax.jit(
        jax.value_and_grad(lambda p: loss_with(xla_field, p))
    )(params)
    ref_loss = float(ref_loss)
    ref_grads = jax.device_get(ref_grads)
    print(f"XLA ref loss={ref_loss:.6f} ({time.time()-t0:.1f}s)", flush=True)

    stages = {
        "A": dict(compute_dtype=jnp.bfloat16, dw_dtype=jnp.float32),
        "B": dict(compute_dtype=jnp.bfloat16, dw_dtype=jnp.bfloat16),
    }
    for name in args.stages.split(","):
        cfgkw = stages[name.strip()]
        print(f"--- stage {name}: {cfgkw} block={args.block}", flush=True)
        try:
            field = make_fused_flexible_field_train(
                model,
                block_samples=min(2 * args.block, 1024),
                block_samples_bwd=args.block,
                **cfgkw,
            )
            t0 = time.time()
            loss, grads = jax.jit(
                jax.value_and_grad(lambda p: loss_with(field, p))
            )(params)
            loss = float(loss)
            grads = jax.device_get(grads)
            errs = jax.tree.map(
                lambda a, b: float(
                    np.max(np.abs(np.asarray(a) - np.asarray(b)))
                    / (np.max(np.abs(np.asarray(b))) + 1e-12)
                ),
                grads,
                ref_grads,
            )
            max_err = max(jax.tree.leaves(errs))
            print(
                f"STAGE-{name}-OK loss={loss:.6f} (ref {ref_loss:.6f}) "
                f"max_rel_grad_err={max_err:.3e} ({time.time()-t0:.1f}s)",
                flush=True,
            )
        except Exception:
            print(f"STAGE-{name}-FAILED", flush=True)
            traceback.print_exc()


if __name__ == "__main__":
    main()
