"""On-chip validation of the fused hierarchical-resample kernel
(``ops/resample_pallas``): builds the combined fused train loss twice —
``resample="xla"`` vs ``resample="pallas"`` — compiles both on the chip
with the SAME key (identical stratified/noise/uniform draws) and compares
loss + every parameter gradient, plus the raw resample outputs
(z_merged / dists) head-to-head.

Interpret-mode parity already exists (tests/test_ops.py); this tool is the
compiled-on-hardware check CLAUDE.md requires before trusting kernels
(Mosaic default-precision dots differ from interpret mode).

Usage: python tools/resample_chip_check.py [--batch 2048] [--block 2048]
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


def _max_rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = np.maximum(np.abs(b), 1e-6)
    return float(np.max(np.abs(a - b) / denom))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--block", type=int, default=2048)
    args = p.parse_args()

    from dexnerf_tpu.core.encoding import encoding_dim
    from dexnerf_tpu.core.sampling import hierarchical_z_vals
    from dexnerf_tpu.core.volrend import ray_dists
    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.ops import make_fused_train_loss
    from dexnerf_tpu.ops.resample_pallas import make_fused_resample
    from dexnerf_tpu.render import RayBatch, RenderSettings

    enc_xyz, enc_dir = 10, 4
    model = FlexibleNeRFModel(
        num_layers=8, hidden_size=128, skip_connect_every=3,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    settings = RenderSettings(
        num_coarse=64, num_fine=64, perturb=True,
        radiance_field_noise_std=0.2,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    in_dim = encoding_dim(3, enc_xyz) + encoding_dim(3, enc_dir)
    key = jax.random.PRNGKey(0)
    params = {
        "coarse": model.init(key, jnp.ones((1, in_dim))),
        "fine": model.init(jax.random.fold_in(key, 1), jnp.ones((1, in_dim))),
    }

    n = args.batch
    rd = jax.random.normal(jax.random.PRNGKey(3), (n, 3))
    rays = RayBatch(
        origins=jnp.zeros((n, 3)),
        directions=rd,
        viewdirs=rd / jnp.linalg.norm(rd, axis=-1, keepdims=True),
        near=jnp.full((n,), 2.0),
        far=jnp.full((n,), 6.0),
    )
    target = jax.random.uniform(jax.random.PRNGKey(4), (n, 3))
    render_key = jax.random.PRNGKey(7)

    # --- 1) raw resample kernel vs the XLA hierarchical path -------------
    Sc, Sf = settings.num_coarse, settings.num_fine
    z_vals = jnp.linspace(2.0, 6.0, Sc)[None, :] + 0.01 * jax.random.uniform(
        jax.random.PRNGKey(9), (n, Sc)
    )
    w = jax.random.uniform(jax.random.PRNGKey(10), (n, Sc)) ** 2.0
    u = jax.random.uniform(jax.random.PRNGKey(11), (n, Sf))
    dn = jnp.linalg.norm(rays.directions, axis=-1, keepdims=True)

    rs = make_fused_resample(Sc, Sf, interpret=False)
    t0 = time.time()
    zk, dk = jax.jit(rs)(z_vals, w, u, dn)
    zk.block_until_ready()
    print(f"resample kernel compiled+ran in {time.time() - t0:.1f}s")

    def xla_ref(z, w, dirs):
        # hierarchical_z_vals(key=k) draws exactly uniform(k, (N, Sf)) —
        # the same u handed to the kernel (pinned by tests/test_ops.py)
        z_merged, _ = hierarchical_z_vals(
            jax.random.PRNGKey(11), z, w, Sf, det=False
        )
        return z_merged, ray_dists(z_merged, dirs)

    zx, dx = jax.jit(xla_ref)(z_vals, w, rays.directions)
    dz = float(jnp.max(jnp.abs(zk - zx)))
    dd = float(jnp.max(jnp.abs(dk - dx)))
    print(f"RAW z_merged max|diff| = {dz:.3e}  dists max|diff| = {dd:.3e}")

    # --- 2) full fused loss: pallas resample vs xla resample --------------
    results = {}
    for mode in ("xla", "pallas"):
        lf = make_fused_train_loss(
            model, model, settings,
            block_samples=args.block, resample=mode,
        )

        def run(p):
            loss, _ = lf(p, rays, target, render_key)
            return loss

        t0 = time.time()
        loss, grads = jax.jit(jax.value_and_grad(run))(params)
        jax.block_until_ready(grads)
        print(f"[{mode}] compiled+ran in {time.time() - t0:.1f}s  "
              f"loss={float(loss):.7f}")
        results[mode] = (float(loss), jax.device_get(grads))

    lx, gx = results["xla"]
    lp, gp = results["pallas"]
    dl = abs(lx - lp)
    print(f"loss |pallas - xla| = {dl:.3e}")

    # Per-leaf norm-relative diff: ||gp - gx|| / ||gx||. The z_merged the
    # two paths feed the fine pass differs by ~1e-4 (cdf prefix-sum
    # accumulation order on the MXU vs XLA's sequential cumsum, amplified
    # through the interpolation divide) — far below the ~0.06 stratified
    # bin width, but enough that per-ELEMENT relative diffs on tiny grad
    # entries are meaningless. Norm-relative is the signal.
    leaves_x, treedef = jax.tree_util.tree_flatten(gx)
    leaves_p, _ = jax.tree_util.tree_flatten(gp)
    paths = [
        "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        for kp, _ in jax.tree_util.tree_flatten_with_path(gx)[0]
    ]
    worst = 0.0
    for name, a, b in zip(paths, leaves_p, leaves_x):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        nrel = float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))
        if nrel > worst:
            worst = nrel
        if nrel > 1e-3:
            print(f"  leaf {name}: norm-rel {nrel:.3e}  "
                  f"max|d| {np.max(np.abs(a - b)):.3e}  "
                  f"max|g| {np.max(np.abs(b)):.3e}")
    mr = max(_max_rel(a, b) for a, b in zip(leaves_p, leaves_x))
    print(f"max per-element rel diff (info only) = {mr:.3e}")
    print(f"worst per-leaf norm-rel grad diff = {worst:.3e}")
    ok = dl < 1e-5 and worst < 2e-2
    print("RESAMPLE-CHIP-OK" if ok else "RESAMPLE-CHIP-FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
