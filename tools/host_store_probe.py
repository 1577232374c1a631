"""TPU timing probe: host-streaming data path vs the device-resident store.

Measures sustained steps/s of the SAME train step (XLA path) fed by
(a) the resident store with in-graph sampling and (b) the HostRayLoader's
prefetched batches. On a directly-attached TPU host the per-batch
``device_put`` rides PCIe and hides behind the previous step; over the
axon REMOTE tunnel each transfer crosses the wire, so this probe reports
what the tunnel actually costs — read the number before quoting overlap
claims on this rig.

Usage: python tools/host_store_probe.py [--batch 4096] [--steps 30]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--samples", type=int, default=32)
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--hw", type=int, default=64)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dexnerf_tpu.core.encoding import encoding_dim
    from dexnerf_tpu.data import (
        HostRayLoader,
        build_host_ray_rows,
        build_ray_store,
        make_synthetic_scene,
    )
    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.render import RenderSettings
    from dexnerf_tpu.train import init_train_state, make_optimizer
    from dexnerf_tpu.train.step import (
        make_batch_train_step,
        make_train_step,
    )

    enc_xyz, enc_dir = 6, 4
    model = FlexibleNeRFModel(
        num_layers=args.layers, hidden_size=args.hidden,
        skip_connect_every=3,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    settings = RenderSettings(
        num_coarse=args.samples, num_fine=args.samples, perturb=True,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    in_dim = encoding_dim(3, enc_xyz) + encoding_dim(3, enc_dir)
    key = jax.random.PRNGKey(0)
    params = {
        "coarse": model.init(key, jnp.ones((1, in_dim))),
        "fine": model.init(jax.random.fold_in(key, 1), jnp.ones((1, in_dim))),
    }
    images, _, poses, hwf = make_synthetic_scene(
        num_views=args.views, height=args.hw, width=args.hw
    )
    tx = make_optimizer(5e-3)
    # both steps donate their state: give each its own param buffers
    params_host_copy = jax.device_get(params)

    # resident path
    store = build_ray_store(images, poses, hwf, 2.0, 6.0)
    rstep = make_train_step(
        model.apply, model.apply, tx, settings, args.batch
    )
    state = init_train_state(params, tx)
    k = jax.random.PRNGKey(1)
    k, sub = jax.random.split(k)
    state, m = rstep(state, store, sub)  # compile
    jax.block_until_ready(m["loss"])
    t0 = time.time()
    for _ in range(args.steps):
        k, sub = jax.random.split(k)
        state, m = rstep(state, store, sub)
    jax.block_until_ready(m["loss"])
    dt_resident = (time.time() - t0) / args.steps
    print(f"resident: {dt_resident*1e3:.2f} ms/step "
          f"({args.batch/dt_resident:.0f} rays/s)", flush=True)

    # host-streaming path
    rows, _ = build_host_ray_rows(images, poses, hwf)
    bstep = make_batch_train_step(model.apply, model.apply, tx, settings)
    state = init_train_state(
        jax.tree.map(jnp.asarray, params_host_copy), tx
    )
    with HostRayLoader(rows, 2.0, 6.0, args.batch, 0) as loader:
        k = jax.random.PRNGKey(1)
        k, sub = jax.random.split(k)
        rays, target = next(loader)
        state, m = bstep(state, rays, target, sub)  # compile
        jax.block_until_ready(m["loss"])
        t0 = time.time()
        for _ in range(args.steps):
            k, sub = jax.random.split(k)
            rays, target = next(loader)
            state, m = bstep(state, rays, target, sub)
        jax.block_until_ready(m["loss"])
        dt_host = (time.time() - t0) / args.steps
    print(f"host-streamed: {dt_host*1e3:.2f} ms/step "
          f"({args.batch/dt_host:.0f} rays/s)", flush=True)
    print(f"overhead: {(dt_host-dt_resident)*1e3:+.2f} ms/step "
          f"({(dt_host/dt_resident-1)*100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
