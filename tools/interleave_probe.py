"""Microbenchmark: is a dependent MXU dot chain latency-bound?

Times the kernels' characteristic chain — L dependent [B, 128] x
[128, 128] bf16 dots with relu — in four shapes (docs/PERF_NOTES.md
"interleave experiment"):

  A one-chain        : the plain dependent chain
  B split-interleave : two independent half-row chains, ops interleaved
  C dual-full        : two independent FULL chains, ops interleaved (2x FLOPs)
  D dual-sequential  : two independent FULL chains, traced sequentially

Measured on v5e (block 2048, L = 12): A 3.13 us/block, B 2.30, C 3.24,
D 2.49 — a second full-size chain is nearly free and trace ORDER does not
matter, only INDEPENDENCE (Mosaic's scheduler overlaps independent
streams). This finding drives the ray-part interleave in the combined
loss kernel and the fused render kernel.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--block", type=int, default=2048)
    p.add_argument("--grid", type=int, default=64)
    args = p.parse_args()
    L, B, GRID = args.layers, args.block, args.grid

    def dot(h, w):
        return jnp.maximum(
            jax.lax.dot_general(
                h.astype(jnp.bfloat16), w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ),
            0.0,
        )

    def chain(x, w, n=L):
        h = x
        for _ in range(n):
            h = dot(h, w)
        return h

    def kern_a(x_ref, w_ref, o_ref):
        o_ref[:] = chain(x_ref[:], w_ref[:].astype(jnp.bfloat16))

    def kern_b(x_ref, w_ref, o_ref):
        w = w_ref[:].astype(jnp.bfloat16)
        h1, h2 = x_ref[0:B // 2, :], x_ref[B // 2:B, :]
        for _ in range(L):
            y1, y2 = dot(h1, w), dot(h2, w)
            h1, h2 = y1, y2
        o_ref[0:B // 2, :] = h1
        o_ref[B // 2:B, :] = h2

    def kern_c(x_ref, w_ref, o_ref):
        w = w_ref[:].astype(jnp.bfloat16)
        h1, h2 = x_ref[:], x_ref[:] + 1.0
        for _ in range(L):
            y1, y2 = dot(h1, w), dot(h2, w)
            h1, h2 = y1, y2
        o_ref[:] = h1 + h2

    def kern_d(x_ref, w_ref, o_ref):
        w = w_ref[:].astype(jnp.bfloat16)
        o_ref[:] = chain(x_ref[:], w) + chain(x_ref[:] + 1.0, w)

    def build(kern):
        @jax.jit
        def run(x, w):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((GRID * B, 128), jnp.float32),
                grid=(GRID,),
                in_specs=[
                    pl.BlockSpec((B, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((128, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((B, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            )(x, w)
        return run

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (GRID * B, 128), jnp.float32) * 0.1
    w = jax.random.normal(jax.random.fold_in(key, 1), (128, 128),
                          jnp.float32) * 0.1
    for name, kern in (("A one-chain", kern_a),
                       ("B split-interleave", kern_b),
                       ("C dual-full", kern_c),
                       ("D dual-sequential", kern_d)):
        run = build(kern)
        y = run(x, w)
        jax.block_until_ready(y)
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            z = x
            for _ in range(10):
                # chain iterations through a data dependency (CLAUDE.md
                # timing rule)
                z = run(z, w)[: GRID * B] * 1e-6 + x
            jax.block_until_ready(z)
            best = min(best, (time.perf_counter() - t0) / 10)
        print(
            f"{name}: {best * 1e3:.3f} ms/call "
            f"({best / GRID * 1e6:.2f} us/block)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
