"""Measure in-program per-step time of the scanned train step (no dispatch
overhead): one dispatch = K optimizer steps via lax.scan. Separates remote-
tunnel dispatch cost from real device time.

    python tools/scan_step_probe.py --k 10 --batch 16384
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--batch", type=int, default=16384)
    p.add_argument("--block", type=int, default=8192)
    p.add_argument("--repeats", type=int, default=6)
    p.add_argument(
        "--resample", type=str, default="auto",
        choices=("auto", "pallas", "xla"),
        help="hierarchical resample path inside the fused loss",
    )
    p.add_argument(
        "--rng", type=str, default="threefry2x32",
        choices=("threefry2x32", "rbg"),
        help="PRNG impl for the step keys: rbg uses the hardware "
        "RngBitGenerator (far cheaper bits on TPU than threefry; "
        "different draw stream, statistically equivalent)",
    )
    args = p.parse_args()

    from dexnerf_tpu.core.encoding import encoding_dim
    from dexnerf_tpu.data import build_ray_store
    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.ops import make_fused_train_loss
    from dexnerf_tpu.render import RenderSettings
    from dexnerf_tpu.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    jax.config.update("jax_default_prng_impl", args.rng)
    enc_xyz, enc_dir = 10, 4
    settings = RenderSettings(
        num_coarse=64, num_fine=64, perturb=True,
        radiance_field_noise_std=0.2,
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
    rng = np.random.RandomState(0)
    images = rng.rand(4, 400, 400, 3).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    poses[:, 2, 3] = 4.0
    store = build_ray_store(images, poses, [400, 400, 555.0], 2.0, 6.0)
    tx = make_optimizer(5e-3)
    state = init_train_state(params, tx)
    fl = make_fused_train_loss(
        model, model, settings, block_samples=args.block,
        compute_dtype=jnp.bfloat16, dw_dtype=jnp.bfloat16,
        resample=args.resample,
    )
    step = make_train_step(
        model.apply, model.apply, tx, settings, args.batch,
        fused_loss=fl, steps_per_call=args.k,
    )
    print(f"--- compiling k={args.k} batch={args.batch}...", flush=True)
    t0 = time.time()
    key, sub = jax.random.split(key)
    state, m = step(state, store, sub)
    jax.block_until_ready(state.params)
    print(f"    compile+first: {time.time()-t0:.1f} s", flush=True)
    best = float("inf")
    for _ in range(args.repeats):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, m = step(state, store, sub)
        # host readback is the only reliable sync on the remote tunnel
        # (block_until_ready alone returns early)
        _ = float(m["loss"])
        best = min(best, time.perf_counter() - t0)
    per = best / args.k
    print(
        f"RESULT scan k={args.k}: {best*1e3:.1f} ms/dispatch, "
        f"{per*1e3:.2f} ms/step ({args.batch/per:.0f} rays/s) "
        f"loss={float(m['loss']):.4f}",
        flush=True,
    )


if __name__ == "__main__":
    raise SystemExit(main())
