"""Micro-probe: which selector-matmul formulation relocates f32 values
EXACTLY through the Mosaic MXU on chip?

The fused-resample kernel needs bit-exact relocation dots (its stable-merge
rank arithmetic compares round-tripped values for equality). The debug taps
show the current 2-pass hi/lo dot (`_split_hi_lo`) loses the whole lo term
on chip (mids off by one bf16 ulp). This probe compiles ONE tiny kernel per
formulation and prints max|dot(v, I_shift) - shift(v)|:

  plain   : f32 x f32 default-precision dot
  hilo2   : bf16 hi dot + f32 lo dot         (current _exact_dot_lhs)
  hilo2f  : f32 hi dot + f32 lo dot          (pre-hardening form)
  hilo3   : bf16 hi + bf16 mid + bf16 lo2    (3-pass, all-bf16 operands)

Usage: python tools/exact_dot_probe.py
"""

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DIMS = (((1,), (0,)), ((), ()))


def _sel(S):
    i0 = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    return jnp.where(i0 == i1 + 1, 1.0, 0.0)  # lane left-shift


def _dot(a, b):
    return jax.lax.dot_general(a, b, DIMS, preferred_element_type=jnp.float32)


def make_kernel(mode):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        sel = _sel(x.shape[1])
        if mode == "plain":
            o_ref[...] = _dot(x, sel)
        elif mode == "hilo2":
            hi = x.astype(jnp.bfloat16)
            lo = x - hi.astype(jnp.float32)
            o_ref[...] = _dot(hi, sel.astype(jnp.bfloat16)) + _dot(lo, sel)
        elif mode == "hilo2f":
            hi = x.astype(jnp.bfloat16).astype(jnp.float32)
            lo = x - hi
            o_ref[...] = _dot(hi, sel) + _dot(lo, sel)
        elif mode == "hilo3":
            sb = sel.astype(jnp.bfloat16)
            hi = x.astype(jnp.bfloat16)
            r1 = x - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo2 = r1 - mid.astype(jnp.float32)
            o_ref[...] = (
                _dot(hi, sb) + _dot(mid, sb) + _dot(lo2.astype(jnp.bfloat16), sb)
            )
        else:
            raise ValueError(mode)

    return kernel


def main():
    R, S = 128, 64
    x = (
        2.0
        + 4.0 * jax.random.uniform(jax.random.PRNGKey(0), (R, S), jnp.float32)
    )
    ref = np.zeros((R, S), np.float32)
    ref[:, :-1] = np.asarray(x)[:, 1:]  # shift(v): out[:, i] = x[:, i+1]

    for mode in ("plain", "hilo2", "hilo2f", "hilo3"):
        out = pl.pallas_call(
            make_kernel(mode),
            out_shape=jax.ShapeDtypeStruct((R, S), jnp.float32),
        )(x)
        d = float(np.max(np.abs(np.asarray(out) - ref)))
        nexact = int(np.sum(np.asarray(out) != ref))
        print(f"{mode:8s} max|out-shift(v)| = {d:.3e}   non-bit-exact entries = {nexact}")


if __name__ == "__main__":
    main()
