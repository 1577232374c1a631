"""Capture a jax.profiler trace of the training hot loop.

The reference has no profiling at all (SURVEY.md §5 — only wall-clock
deltas around validation). This tool runs warmup + N traced train steps on
the current backend and writes a TensorBoard-loadable trace directory.

    python tools/profile_step.py --steps 20 --outdir logs/trace
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--outdir", type=str, default="logs/trace")
    p.add_argument(
        "--fused",
        action="store_true",
        help="profile the fused Pallas field path (TPU-validated config)",
    )
    p.add_argument(
        "--fused-loss",
        action="store_true",
        help="profile the combined loss+gradients kernel path (the TPU "
        "default; block 2048)",
    )
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from dexnerf_tpu.core.encoding import encoding_dim
    from dexnerf_tpu.data import build_ray_store
    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.render import RenderSettings
    from dexnerf_tpu.train import init_train_state, make_optimizer, make_train_step
    from dexnerf_tpu.train.logging import profiler_trace

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
    images = rng.rand(2, 128, 128, 3).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    store = build_ray_store(images, poses, [128, 128, 150.0], 2.0, 6.0)
    tx = make_optimizer(5e-3)
    state = init_train_state(params, tx)
    cf = ff = None
    if args.fused:
        from dexnerf_tpu.ops import make_fused_flexible_field_train

        def fused():
            return make_fused_flexible_field_train(
                model, block_samples=1024, block_samples_bwd=1024,
                compute_dtype=jnp.bfloat16, dw_dtype=jnp.bfloat16,
            )

        cf, ff = fused(), fused()
    fl = None
    if args.fused_loss:
        from dexnerf_tpu.ops import make_fused_train_loss

        fl = make_fused_train_loss(
            model, model, settings, block_samples=8192,
            compute_dtype=jnp.bfloat16, dw_dtype=jnp.bfloat16,
        )
    step = make_train_step(
        model.apply, model.apply, tx, settings, args.batch,
        coarse_field=cf, fine_field=ff, fused_loss=fl,
    )

    for _ in range(args.warmup):
        key, sub = jax.random.split(key)
        state, _ = step(state, store, sub)
    jax.block_until_ready(state.params)

    with profiler_trace(args.outdir):
        for _ in range(args.steps):
            key, sub = jax.random.split(key)
            state, _ = step(state, store, sub)
        jax.block_until_ready(state.params)
    print(f"trace written to {args.outdir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
