"""Head-to-head: fused Pallas train step vs the XLA train step (on chip).

Round-1 result was XLA 47.5 ms vs fused-f32 125.7 ms. Round 2 unlocked the
bf16 backward (f32 chain + bf16 dot operands); this times full train steps
(sample → coarse+fine render → loss → grads → Adam) with the fused field
in several configurations against the XLA baseline.

Timing rules per CLAUDE.md: iterations chained through the donated train
state (data dependency), best-of-N blocks.
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

BATCH = 4096  # overridden by --batch
STEPS = 20
REPEATS = 3


def time_step(step, state, store, key):
    # warmup / compile
    state, _ = step(state, store, key)
    jax.block_until_ready(state.params)
    best = float("inf")
    for r in range(REPEATS):
        keys = jax.random.split(jax.random.fold_in(key, r), STEPS)
        t0 = time.time()
        for k in keys:
            state, metrics = step(state, store, k)
        jax.block_until_ready(state.params)
        best = min(best, (time.time() - t0) / STEPS)
    return best * 1e3, state


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--configs", type=str, default="xla,bf16_dwf32_512,bf16_dwbf16_512,bf16_dwbf16_1024"
    )
    global BATCH
    p.add_argument("--batch", type=int, default=BATCH)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--hidden", type=int, default=128,
                   help="MLP width (256 = paper-scale NeRF)")
    args = p.parse_args()
    BATCH = args.batch

    from dexnerf_tpu.core.encoding import encoding_dim
    from dexnerf_tpu.data import build_ray_store, make_synthetic_scene
    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.ops import make_fused_flexible_field_train
    from dexnerf_tpu.render import RenderSettings
    from dexnerf_tpu.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    enc_xyz, enc_dir = 10, 4
    settings = RenderSettings(
        num_coarse=64, num_fine=64, perturb=True,
        radiance_field_noise_std=0.2,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    model = FlexibleNeRFModel(
        num_layers=args.layers, hidden_size=args.hidden,
        skip_connect_every=3,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    in_dim = encoding_dim(3, enc_xyz) + encoding_dim(3, enc_dir)
    key = jax.random.PRNGKey(0)
    params = {
        "coarse": model.init(key, jnp.ones((1, in_dim))),
        "fine": model.init(jax.random.fold_in(key, 1), jnp.ones((1, in_dim))),
    }
    images, _, poses, hwf = make_synthetic_scene(
        num_views=4, height=64, width=64
    )
    store = build_ray_store(images, poses, hwf, 2.0, 6.0)
    tx = make_optimizer(5e-3)

    def fused(dw, block, skip_dw=False, fwd_block=1024):
        return make_fused_flexible_field_train(
            model,
            block_samples=fwd_block,
            block_samples_bwd=block,
            compute_dtype=jnp.bfloat16,
            dw_dtype=dw,
            _skip_dw=skip_dw,
        )

    def fused_loss(block, cd=jnp.bfloat16, dw=jnp.bfloat16, n_parts=None):
        from dexnerf_tpu.ops import make_fused_train_loss

        return make_fused_train_loss(
            model, model, settings,
            block_samples=block, compute_dtype=cd, dw_dtype=dw,
            parts=n_parts,
        )

    for name in args.configs.split(","):
        name = name.strip()
        fl = None
        if name == "xla":
            cf = ff = None
        elif name == "bf16_dwf32_512":
            cf, ff = fused(jnp.float32, 512), fused(jnp.float32, 512)
        elif name == "bf16_dwbf16_512":
            cf, ff = fused(jnp.bfloat16, 512), fused(jnp.bfloat16, 512)
        elif name == "bf16_dwbf16_1024":
            cf, ff = fused(jnp.bfloat16, 1024), fused(jnp.bfloat16, 1024)
        elif name == "bf16_bwd2048":
            cf = fused(jnp.bfloat16, 2048)
            ff = fused(jnp.bfloat16, 2048)
        elif name == "bf16_bwd4096":
            cf = fused(jnp.bfloat16, 4096, fwd_block=4096)
            ff = fused(jnp.bfloat16, 4096, fwd_block=4096)
        elif name == "bf16_bwd8192":
            cf = fused(jnp.bfloat16, 8192, fwd_block=8192)
            ff = fused(jnp.bfloat16, 8192, fwd_block=8192)
        elif name == "bf16_fwd2048":
            cf = fused(jnp.bfloat16, 1024, fwd_block=2048)
            ff = fused(jnp.bfloat16, 1024, fwd_block=2048)
        elif name == "bf16_skipdw_1024":
            # timing bisection only: dW matmuls replaced by zeros
            cf = fused(jnp.bfloat16, 1024, skip_dw=True)
            ff = fused(jnp.bfloat16, 1024, skip_dw=True)
        elif name.startswith("loss_"):
            # combined loss+grads kernel (ops/fused_train_loss):
            # loss_<block>[_f32][_p<parts>]
            toks = name.split("_")
            cd = jnp.float32 if "f32" in toks[2:] else jnp.bfloat16
            n_parts = None
            for t in toks[2:]:
                if t.startswith("p"):
                    n_parts = int(t[1:])
            cf = ff = None
            fl = fused_loss(int(toks[1]), cd=cd, dw=cd, n_parts=n_parts)
        else:
            raise ValueError(name)
        step = make_train_step(
            model.apply, model.apply, tx, settings, BATCH,
            coarse_field=cf, fine_field=ff, fused_loss=fl,
        )
        # fresh param copies: the donated train state consumes its buffers
        state = init_train_state(
            jax.tree.map(lambda x: jnp.array(x), params), tx
        )
        print(f"--- {name}: compiling+timing...", flush=True)
        try:
            ms, st = time_step(step, state, store, jax.random.PRNGKey(7))
            loss_probe = None
            # one synced step for a loss sanity value
            st2, metrics = step(st, store, jax.random.PRNGKey(9))
            loss_probe = float(metrics["loss"])
            print(
                f"RESULT {name}: {ms:.2f} ms/step "
                f"({BATCH / ms * 1000:.0f} rays/s) loss={loss_probe:.4f}",
                flush=True,
            )
        except Exception as e:
            print(f"RESULT {name}: FAILED {type(e).__name__}", flush=True)
            import traceback

            traceback.print_exc()


if __name__ == "__main__":
    main()
