"""Microbenchmark tighten_ray_intervals on the chip: where do 165 ms go?

Times (a) the full tighten, (b) the grid gather alone, (c) the point
arithmetic alone, for several (probes, resolution) shapes. Chained-input
best-of-N per CLAUDE.md timing rules.
"""

import argparse
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rays", type=int, default=160000)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--platform", default=None, choices=("cpu", "tpu", "axon"))
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from dexnerf_tpu.render.occupancy import (
        OccupancyGrid,
        tighten_image_intervals,
        tighten_ray_intervals,
    )

    n = args.rays
    rng = np.random.default_rng(0)
    origins = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    directions = jnp.asarray(d)
    near = jnp.full((n,), 2.0, jnp.float32)
    far = jnp.full((n,), 6.0, jnp.float32)

    def bench(fn, *xs):
        out = fn(*xs)
        jax.block_until_ready(out)
        best = float("inf")
        o = origins
        for _ in range(args.repeats):
            t0 = time.time()
            out = fn(o, *xs[1:])
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
            leaf = jax.tree_util.tree_leaves(out)[0]
            o = origins + 1e-12 * jnp.mean(leaf.astype(jnp.float32))
        return best

    for res in (128, 32):
        occ = jnp.asarray(
            rng.random((res, res, res)) < 0.065
        )
        grid = OccupancyGrid(
            occ=occ,
            center=jnp.zeros(3, jnp.float32),
            radius=jnp.asarray(1.3, jnp.float32),
        )
        for k in (128, 32):

            @jax.jit
            def full(o, grid=grid, k=k):
                return tighten_ray_intervals(
                    grid, o, directions, near, far, num_probes=k
                )

            t_full = bench(full, origins)

            @jax.jit
            def gather_only(o, grid=grid, k=k):
                # isolate the flat take: fake indices from coords
                t = near[:, None] + (far - near)[:, None] * (
                    (jnp.arange(k, dtype=jnp.float32) + 0.5) / k
                )
                pts = o[:, None, :] + directions[:, None, :] * t[..., None]
                idx = jnp.clip(
                    jnp.floor(
                        (pts[..., 0] + 1.3) / (2.6 / res)
                    ).astype(jnp.int32),
                    0,
                    res**3 - 1,
                )
                occ_flat = grid.occ.reshape(-1).astype(jnp.uint8)
                return jnp.take(occ_flat, idx).sum()

            t_gather = bench(gather_only, origins)

            @jax.jit
            def arith_only(o, k=k):
                t = near[:, None] + (far - near)[:, None] * (
                    (jnp.arange(k, dtype=jnp.float32) + 0.5) / k
                )
                pts = o[:, None, :] + directions[:, None, :] * t[..., None]
                u = (pts + 1.3) / (2.6 / res)
                idx = jnp.floor(u).astype(jnp.int32)
                inb = jnp.all((idx >= 0) & (idx < res), axis=-1)
                return (idx.sum(), inb.sum())

            t_arith = bench(arith_only, origins)

            side = int(np.sqrt(n))
            img = None
            if side * side == n:

                @jax.jit
                def image(o, grid=grid, k=k):
                    return tighten_image_intervals(
                        grid, o, directions, near, far, (side, side),
                        num_probes=k, subsample=2,
                    )

                img = bench(image, origins)
            print(
                f"res {res:3d} probes {k:3d}: full {t_full*1e3:7.1f} ms  "
                f"gather+pts {t_gather*1e3:7.1f} ms  "
                f"pts-only {t_arith*1e3:7.1f} ms  "
                + (f"image/2 {img*1e3:7.1f} ms" if img is not None else ""),
                flush=True,
            )


if __name__ == "__main__":
    main()
