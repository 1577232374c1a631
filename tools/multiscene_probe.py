"""Single-chip multi-scene throughput probe.

Multi-scene training (``parallel/multiscene.py``) exists for mesh scale-out
(one scene per chip, zero collectives), but it is also a potential
single-chip lever: the flagship MLP's dot chains are latency-bound
(docs/PERF_NOTES.md "interleave"), and M scenes' chains are independent, so
XLA may interleave them. This probe times the vmapped XLA-path step at
M = 1, 2, 4 scenes on one chip and reports per-scene and aggregate
throughput.

Timing: ``steps_per_call`` scanned steps per dispatch (in-program per-step
time, no dispatch overhead), iterations chained through the train state,
best-of-N blocks (CLAUDE.md timing rules).
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


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scenes", type=str, default="1,2,4")
    p.add_argument("--batch", type=int, default=4096,
                   help="rays per scene per step")
    p.add_argument("--steps-per-call", type=int, default=10)
    p.add_argument("--blocks", type=int, default=3, help="timed dispatches")
    args = p.parse_args()

    from dexnerf_tpu.core.encoding import encoding_dim
    from dexnerf_tpu.data import build_ray_store, make_synthetic_scene
    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.parallel import (
        init_multi_scene_state,
        make_multi_scene_train_step,
        stack_params,
        stack_ray_stores,
    )
    from dexnerf_tpu.render import RenderSettings
    from dexnerf_tpu.train import make_optimizer

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
    tx = make_optimizer(5e-3)

    def scene_setup(s):
        images, _, poses, hwf = make_synthetic_scene(
            num_views=4, height=64, width=64, seed=s
        )
        store = build_ray_store(images, poses, hwf, 2.0, 6.0)
        key = jax.random.PRNGKey(s)
        params = {
            "coarse": model.init(key, jnp.ones((1, in_dim))),
            "fine": model.init(
                jax.random.fold_in(key, 1), jnp.ones((1, in_dim))
            ),
        }
        return store, params

    for m in [int(x) for x in args.scenes.split(",")]:
        pairs = [scene_setup(s) for s in range(m)]
        ms = stack_ray_stores([st for st, _ in pairs])
        state = init_multi_scene_state(
            stack_params([pp for _, pp in pairs]), tx
        )
        step = make_multi_scene_train_step(
            model.apply, model.apply, tx, settings,
            batch_per_scene=args.batch,
            steps_per_call=args.steps_per_call,
        )
        key = jax.random.PRNGKey(0)
        key, sub = jax.random.split(key)
        state, metrics = step(state, ms, sub)  # compile + warmup
        jax.block_until_ready(metrics["loss"])
        best = float("inf")
        for _ in range(args.blocks):
            key, sub = jax.random.split(key)
            t0 = time.time()
            state, metrics = step(state, ms, sub)
            jax.block_until_ready(metrics["loss"])
            best = min(best, (time.time() - t0) / args.steps_per_call)
        rays = m * args.batch
        print(
            f"RESULT scenes={m}: {best*1e3:.2f} ms/step "
            f"({rays/best/1e3:.0f} krays/s aggregate, "
            f"{args.batch/best/1e3:.0f} krays/s/scene)",
            flush=True,
        )


if __name__ == "__main__":
    main()
