"""Measure per-pallas_call launch overhead on the current runtime.

Times a chain of K trivial (one-tile add) kernel calls inside one jitted
program vs a single fused XLA chain of the same adds — the difference is
K * per-custom-call overhead. Informs whether merging the coarse+fine train
kernels into one pallas_call would pay (docs/PERF_NOTES round 3).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--k", type=int, default=50)
    p.add_argument("--rows", type=int, default=256)
    p.add_argument("--repeats", type=int, default=8)
    args = p.parse_args()

    def kern(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] + 1.0

    shape = (args.rows, 128)

    def one(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(shape, lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(shape, lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
        )(x)

    @jax.jit
    def chain_pallas(x):
        for _ in range(args.k):
            x = one(x)
        return jnp.sum(x)

    @jax.jit
    def chain_xla(x):
        for _ in range(args.k):
            # sin defeats fusion collapse enough to keep K real ops
            x = jnp.sin(x) + 1.0
        return jnp.sum(x)

    x = jnp.zeros(shape, jnp.float32)
    for name, fn in (("pallas", chain_pallas), ("xla", chain_xla)):
        s = float(fn(x))  # compile + first
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            s = float(fn(x + s * 0))  # chained through s
            best = min(best, time.perf_counter() - t0)
        print(
            f"RESULT {name}: {best*1e3:.2f} ms for {args.k} calls "
            f"-> {best/args.k*1e6:.0f} us/call",
            flush=True,
        )


if __name__ == "__main__":
    raise SystemExit(main())
