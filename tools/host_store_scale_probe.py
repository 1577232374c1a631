"""Host-streaming store at its ACTUAL scale: a beyond-HBM memmap, trained from.

``data/host_store.py`` exists for ray stores that exceed the chip's HBM
(v5e: 16 GB), but the round-3 measurement covered only a small store where
the resident path wins anyway. This probe builds a memmap ray store ~2x
HBM and trains from it on the chip, recording sustained rays/s and the
tax (or overlap win) of the prefetched host gather at the scale the
subsystem was built for.

Stages (resumable; artifacts under --workdir):

  bank  — render a K-view content bank of the analytic scene + pack its
          rays into ``rows_base.npy`` ([K*H*W, 12], ~1.5 GB). Chip-fast;
          also runs on CPU (--platform cpu) at reduced sizes.
  pack  — replicate the base rows into ``store.mmap`` until --gb is
          reached (sequential host IO, no device). Replication mirrors
          the reference's cache ``--num-variations`` semantics (the same
          views drawn many times, laid out explicitly); random training
          gathers span the FULL file, so the IO path under test is the
          honest beyond-HBM pattern.
  run   — np.memmap the store, stream batches through HostRayLoader +
          make_batch_train_step on the chip; record sustained rays/s,
          the resident-store A/B on the base slice, and a loss-decrease
          sanity. Writes ``docs/HOST_STORE_SCALE.json``.

    python tools/host_store_scale_probe.py --stage all       # TPU
    python tools/host_store_scale_probe.py --stage all --platform cpu \
        --hw 64 --bank-views 4 --gb 0.02 --batch 1024 --steps 40   # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stage", default="all",
                   choices=("bank", "pack", "run", "all"))
    p.add_argument("--workdir", default="/tmp/host_store_scale")
    p.add_argument("--gb", type=float, default=30.0,
                   help="target store size in GiB (~2x v5e HBM)")
    p.add_argument("--hw", type=int, default=800)
    p.add_argument("--bank-views", type=int, default=48)
    p.add_argument("--batch", type=int, default=16384)
    p.add_argument("--steps", type=int, default=300,
                   help="timed steps per measurement block")
    p.add_argument("--blocks", type=int, default=3,
                   help="best-of-N measurement blocks (tunnel stalls)")
    p.add_argument("--samples", type=int, default=32)
    p.add_argument("--out", default=os.path.join(
        REPO, "docs", "HOST_STORE_SCALE.json"))
    p.add_argument("--platform", default=None, choices=("cpu", "tpu", "axon"))
    return p


def stage_bank(args) -> None:
    import jax.numpy as jnp
    import numpy as np

    from dexnerf_tpu.data import build_host_ray_rows
    from dexnerf_tpu.data.synthetic import make_synthetic_scene

    t0 = time.time()
    images, _, poses, hwf = make_synthetic_scene(
        num_views=args.bank_views, height=args.hw, width=args.hw,
        num_gt_samples=128,
    )
    rows, _ = build_host_ray_rows(images, poses, hwf)
    os.makedirs(args.workdir, exist_ok=True)
    np.save(os.path.join(args.workdir, "rows_base.npy"), rows)
    # packed-wire ingredients: u8 pixels + the pose table inputs
    from dexnerf_tpu.data.host_store import images_to_u8

    np.savez(
        os.path.join(args.workdir, "bank_meta.npz"),
        rgb_u8=images_to_u8(images),
        poses=np.asarray(poses, np.float32),
        hwf=np.asarray([hwf[0], hwf[1], hwf[2]], np.float64),
    )
    print(
        f"bank: {args.bank_views} views at {args.hw}x{args.hw} -> "
        f"{rows.shape[0]} rays ({rows.nbytes / 2**30:.2f} GiB) in "
        f"{time.time() - t0:.0f}s",
        flush=True,
    )


def stage_pack(args) -> int:
    import numpy as np

    base = np.load(
        os.path.join(args.workdir, "rows_base.npy"), mmap_mode="r"
    )
    reps = max(1, int(np.ceil(args.gb * 2**30 / base.nbytes)))
    n = reps * base.shape[0]
    path = os.path.join(args.workdir, "store.mmap")
    t0 = time.time()
    mm = np.memmap(path, dtype=np.float32, mode="w+", shape=(n, 12))
    chunk = max(1, base.shape[0] // 8)
    for r in range(reps):
        for i in range(0, base.shape[0], chunk):
            j = min(i + chunk, base.shape[0])
            mm[r * base.shape[0] + i : r * base.shape[0] + j] = base[i:j]
        if r % max(1, reps // 5) == 0:
            print(f"pack: {r + 1}/{reps} replicas", flush=True)
    mm.flush()
    del mm
    # the packed-wire u8 pixel store over the SAME logical rays (16x
    # smaller on disk; the wire, not the store, is what the run stage
    # measures)
    bank = np.load(os.path.join(args.workdir, "bank_meta.npz"))
    rgb_base = bank["rgb_u8"]
    rgb_mm = np.memmap(
        os.path.join(args.workdir, "store_rgb.mmap"), dtype=np.uint8,
        mode="w+", shape=(n, 3),
    )
    for r in range(reps):
        rgb_mm[r * rgb_base.shape[0] : (r + 1) * rgb_base.shape[0]] = \
            rgb_base
    rgb_mm.flush()
    del rgb_mm
    gib = n * 48 / 2**30
    print(
        f"pack: {n} rays, {gib:.1f} GiB at {path} "
        f"(+{n * 3 / 2**30:.1f} GiB u8 pixel store) "
        f"({time.time() - t0:.0f}s, {reps} replicas)",
        flush=True,
    )
    with open(os.path.join(args.workdir, "store_meta.json"), "w") as f:
        json.dump({"n": int(n), "reps": int(reps), "gib": gib,
                   "base_rays": int(base.shape[0])}, f)
    return n


def stage_run(args) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dexnerf_tpu.core.encoding import encoding_dim
    from dexnerf_tpu.data import HostRayLoader
    from dexnerf_tpu.data.pipeline import RayStore
    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.render import RenderSettings
    from dexnerf_tpu.train import init_train_state, make_optimizer
    from dexnerf_tpu.train.step import make_batch_train_step, make_train_step

    with open(os.path.join(args.workdir, "store_meta.json")) as f:
        meta = json.load(f)
    mm = np.memmap(
        os.path.join(args.workdir, "store.mmap"), dtype=np.float32,
        mode="r", shape=(meta["n"], 12),
    )

    enc_xyz, enc_dir = 10, 4
    S = int(args.samples)
    model = FlexibleNeRFModel(
        num_layers=8, hidden_size=128, skip_connect_every=3,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    settings = RenderSettings(
        num_coarse=S, num_fine=S, perturb=True, white_background=True,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    in_dim = encoding_dim(3, enc_xyz) + encoding_dim(3, enc_dir)
    key = jax.random.PRNGKey(0)
    params = {
        "coarse": model.init(key, jnp.ones((1, in_dim))),
        "fine": model.init(jax.random.fold_in(key, 1), jnp.ones((1, in_dim))),
    }
    params_copy = jax.device_get(params)
    tx = make_optimizer(5e-3)
    near, far = 2.0, 6.0

    # --- host-streamed training over the FULL memmap ------------------
    bstep = make_batch_train_step(model.apply, model.apply, tx, settings)
    state = init_train_state(params, tx)
    losses = []
    best = None
    with HostRayLoader(mm, near, far, args.batch, 0, prefetch=3) as loader:
        k = jax.random.PRNGKey(1)
        k, sub = jax.random.split(k)
        rays, target = next(loader)
        state, m = bstep(state, rays, target, sub)  # compile
        jax.block_until_ready(m["loss"])
        losses.append(float(m["loss"]))
        for b in range(args.blocks):
            t0 = time.time()
            for _ in range(args.steps):
                k, sub = jax.random.split(k)
                rays, target = next(loader)
                state, m = bstep(state, rays, target, sub)
            jax.block_until_ready(m["loss"])
            dt = (time.time() - t0) / args.steps
            losses.append(float(m["loss"]))
            print(
                f"host block {b}: {dt * 1e3:.2f} ms/step "
                f"({args.batch / dt:.0f} rays/s), loss {losses[-1]:.4f}",
                flush=True,
            )
            best = dt if best is None else min(best, dt)
    dt_host = best

    # --- packed wire over the same logical store ----------------------
    # u32 idx + u8 rgb (7 B/ray vs 56); rays reconstructed in-step from
    # the replicated pose table (data/host_store.py round-5)
    from dexnerf_tpu.data.host_store import (
        HostPixelLoader,
        build_pose_tables,
        make_ray_unpack,
    )

    bank = np.load(os.path.join(args.workdir, "bank_meta.npz"))
    poses_rep = np.tile(bank["poses"], (meta["reps"], 1, 1))
    tables = build_pose_tables(poses_rep, list(bank["hwf"]))
    rgb_mm = np.memmap(
        os.path.join(args.workdir, "store_rgb.mmap"), dtype=np.uint8,
        mode="r", shape=(meta["n"], 3),
    )
    pstep = make_batch_train_step(
        model.apply, model.apply, tx, settings,
        unpack=make_ray_unpack(tables, near, far),
    )
    state = init_train_state(jax.tree.map(jnp.asarray, params_copy), tx)
    p_losses = []
    best_p = None
    with HostPixelLoader(rgb_mm, args.batch, 0, prefetch=3) as loader:
        k = jax.random.PRNGKey(1)
        k, sub = jax.random.split(k)
        state, m = pstep(state, next(loader), sub)  # compile
        jax.block_until_ready(m["loss"])
        p_losses.append(float(m["loss"]))
        for b in range(args.blocks):
            t0 = time.time()
            for _ in range(args.steps):
                k, sub = jax.random.split(k)
                state, m = pstep(state, next(loader), sub)
            jax.block_until_ready(m["loss"])
            dt = (time.time() - t0) / args.steps
            p_losses.append(float(m["loss"]))
            print(
                f"packed block {b}: {dt * 1e3:.2f} ms/step "
                f"({args.batch / dt:.0f} rays/s), loss {p_losses[-1]:.4f}",
                flush=True,
            )
            best_p = dt if best_p is None else min(best_p, dt)
    dt_packed = best_p

    # --- resident A/B on the base slice (fits HBM) --------------------
    base = np.load(
        os.path.join(args.workdir, "rows_base.npy"), mmap_mode="r"
    )
    n_res = min(base.shape[0], 64 * 2**20 // 48 * 8)  # cap ~few GiB
    data = jnp.asarray(np.asarray(base[:n_res]))
    store = RayStore(data=data, near=near, far=far)
    rstep = make_train_step(model.apply, model.apply, tx, settings,
                            args.batch)
    state = init_train_state(jax.tree.map(jnp.asarray, params_copy), tx)
    k = jax.random.PRNGKey(1)
    k, sub = jax.random.split(k)
    state, m = rstep(state, store, sub)
    jax.block_until_ready(m["loss"])
    best_r = None
    for b in range(args.blocks):
        t0 = time.time()
        for _ in range(args.steps):
            k, sub = jax.random.split(k)
            state, m = rstep(state, store, sub)
        jax.block_until_ready(m["loss"])
        dt = (time.time() - t0) / args.steps
        print(
            f"resident block {b}: {dt * 1e3:.2f} ms/step "
            f"({args.batch / dt:.0f} rays/s)",
            flush=True,
        )
        best_r = dt if best_r is None else min(best_r, dt)
    dt_res = best_r

    report = {
        "protocol": (
            f"np.memmap store of {meta['gib']:.1f} GiB "
            f"({meta['n']} rays; {meta['reps']} replicas of a "
            f"{meta['base_rays']}-ray/{args.hw}px bank) streamed through "
            f"HostRayLoader (prefetch 3) into make_batch_train_step "
            f"(XLA path, 8x128, {S}+{S} samples, batch {args.batch}); "
            f"best-of-{args.blocks} blocks of {args.steps} steps; "
            f"resident A/B on a {n_res}-ray device store"
        ),
        "backend": __import__("jax").default_backend(),
        "store_gib": round(meta["gib"], 2),
        "host_ms_per_step": round(dt_host * 1e3, 2),
        "host_rays_per_s": round(args.batch / dt_host, 0),
        "packed_ms_per_step": round(dt_packed * 1e3, 2),
        "packed_rays_per_s": round(args.batch / dt_packed, 0),
        "packed_wire_bytes_per_ray": 7,
        "rows_wire_bytes_per_ray": 56,
        "resident_ms_per_step": round(dt_res * 1e3, 2),
        "resident_rays_per_s": round(args.batch / dt_res, 0),
        "tax_ms_per_step": round((dt_host - dt_res) * 1e3, 2),
        "tax_pct": round((dt_host / dt_res - 1) * 100, 1),
        "packed_tax_ms_per_step": round((dt_packed - dt_res) * 1e3, 2),
        "packed_tax_pct": round((dt_packed / dt_res - 1) * 100, 1),
        "loss_first": round(losses[0], 4),
        "loss_last": round(losses[-1], 4),
        "loss_decreased": bool(losses[-1] < losses[0]),
        "packed_loss_decreased": bool(p_losses[-1] < p_losses[0]),
        "batch": int(args.batch),
    }
    d = os.path.dirname(args.out)
    if d:
        os.makedirs(d, exist_ok=True)
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(report, f, indent=1)
    os.replace(tmp, args.out)
    print(json.dumps(report, indent=1))
    print(f"wrote {args.out}")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    if args.stage in ("bank", "all"):
        if args.stage == "all" and os.path.exists(
            os.path.join(args.workdir, "rows_base.npy")
        ):
            print("bank exists, skipping", flush=True)
        else:
            stage_bank(args)
    if args.stage in ("pack", "all"):
        if args.stage == "all" and os.path.exists(
            os.path.join(args.workdir, "store_meta.json")
        ):
            print("store exists, skipping", flush=True)
        else:
            stage_pack(args)
    if args.stage in ("run", "all"):
        stage_run(args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
