"""Bisect the fused-resample chip failure with the kernel's debug taps.

Runs each ``debug_stage`` tap of ``ops/resample_pallas`` compiled on the
chip AND in interpret mode on the same inputs, printing max|diff| per
stage plus the permutation check (all-ones iff the merge ranks form a
valid permutation per ray).

Usage: python tools/resample_debug_probe.py [--batch 256]
"""

import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    args = p.parse_args()

    from dexnerf_tpu.ops.resample_pallas import make_fused_resample

    Sc, Sf = 64, 64
    n = args.batch
    z_vals = jnp.linspace(2.0, 6.0, Sc)[None, :] + 0.01 * jax.random.uniform(
        jax.random.PRNGKey(9), (n, Sc)
    )
    w = jax.random.uniform(jax.random.PRNGKey(10), (n, Sc)) ** 2.0
    u = jax.random.uniform(jax.random.PRNGKey(11), (n, Sf))
    dn = jnp.ones((n, 1))

    for stage in ("mids", "cdf", "zf", "pos_c", "pos_f", "perm"):
        rs_chip = make_fused_resample(Sc, Sf, debug_stage=stage)
        rs_int = make_fused_resample(Sc, Sf, interpret=True, debug_stage=stage)
        zc_chip, _ = jax.jit(rs_chip)(z_vals, w, u, dn)
        zc_int, _ = jax.jit(rs_int)(z_vals, w, u, dn)
        a = np.asarray(zc_chip)
        b = np.asarray(zc_int)
        d = float(np.max(np.abs(a - b)))
        extra = ""
        if stage == "perm":
            bad_chip = int(np.sum(a != 1.0))
            bad_int = int(np.sum(b != 1.0))
            extra = f"  non-one entries: chip={bad_chip} interpret={bad_int}"
        print(f"{stage:8s} max|chip-interpret| = {d:.3e}{extra}")


if __name__ == "__main__":
    main()
