"""Forward-field microbenchmark: XLA PE+MLP vs the fused Pallas kernel.

Locates where the fused train step's time goes: if the forward-only kernel
already trails XLA, the kernel/grid structure is the problem, not the
backward. Iterations chained through a data dependency (CLAUDE.md timing
rules), best-of-N.
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

N, S = 4096, 64
STEPS = 30
REPEATS = 3


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--configs", type=str, default="xla,fused512,fused1024,fused2048,fused4096"
    )
    args = p.parse_args()

    from dexnerf_tpu.core.encoding import encoding_dim
    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.ops import make_fused_flexible_field
    from dexnerf_tpu.render.renderer import RenderSettings, make_mlp_field

    enc_xyz, enc_dir = 10, 4
    model = FlexibleNeRFModel(
        num_layers=8, hidden_size=128, skip_connect_every=3,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    settings = RenderSettings(
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir
    )
    in_dim = encoding_dim(3, enc_xyz) + encoding_dim(3, enc_dir)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.ones((1, in_dim)))
    pts0 = jax.random.normal(jax.random.fold_in(key, 1), (N, S, 3))
    dirs = jax.random.normal(jax.random.fold_in(key, 2), (N, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    def build(name):
        if name == "xla":
            return make_mlp_field(model.apply, settings)
        block = int(name.replace("fused", ""))
        return make_fused_flexible_field(
            model, block_samples=block, compute_dtype=jnp.bfloat16
        )

    for name in args.configs.split(","):
        name = name.strip()
        field = build(name)

        @jax.jit
        def chained(pts):
            raw = field(params, pts, dirs)
            # feed a tiny function of the output back into the next input
            return pts + 1e-12 * raw[..., :3]

        print(f"--- {name}: compiling...", flush=True)
        try:
            pts = chained(pts0)
            jax.block_until_ready(pts)
            best = float("inf")
            for _ in range(REPEATS):
                t0 = time.time()
                cur = pts
                for _ in range(STEPS):
                    cur = chained(cur)
                jax.block_until_ready(cur)
                best = min(best, (time.time() - t0) / STEPS)
            ms = best * 1e3
            rate = N * S / best / 1e6
            print(f"RESULT {name}: {ms:.2f} ms ({rate:.0f} Msamples/s)",
                  flush=True)
        except Exception as e:
            print(f"RESULT {name}: FAILED {type(e).__name__}", flush=True)
            import traceback
            traceback.print_exc()


if __name__ == "__main__":
    main()
