"""Multi-scene training CLI: N scenes, one program, zero collectives.

The reference scales to many scenes by launching one Kubernetes job per
scene (``job-example.yaml``); this command trains them together — each
scene an independent NeRF vmapped over a scene axis and sharded one (or
more) per device over the mesh (``parallel/multiscene.py``)::

    python -m dexnerf_tpu.apps.multiscene \
        --configs configs/scene_a.yml configs/scene_b.yml [--max-iters N]

All configs must agree on the model architecture and train-time render
settings (they are compiled into ONE program); datasets, near/far, seeds,
and logdirs stay per-scene. Per-scene checkpoints land under each config's
own ``<logdir>/<id>/checkpoints`` in the standard schema, so every scene's
result is consumable by ``apps.eval`` / ``apps.export`` unchanged.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--configs", type=str, nargs="+", required=True,
        help="one YAML config per scene",
    )
    p.add_argument("--max-iters", type=int, default=None,
                   help="override train_iters (from the first config)")
    p.add_argument(
        "--validate-every", type=int, default=None,
        help="full-frame validation render per scene every N iters "
        "(default: the first config's experiment.validate_every; 0 off): "
        "PSNR/SSIM appended to each scene's metrics.jsonl, the render "
        "saved under <logdir>/validation/",
    )
    p.add_argument("--steps-per-call", type=int, default=None,
                   help="optimizer steps per dispatch (lax.scan)")
    p.add_argument("--batch", type=int, default=None,
                   help="override rays per scene per step")
    p.add_argument(
        "--data-devices", type=int, default=None,
        help="data-parallel devices PER SCENE: train on a 2-D (scene, rays) "
        "mesh — scenes sharded over the outer axis, each scene's ray batch "
        "split over its own inner device group (gradient pmean rides that "
        "group's ICI links; zero cross-scene communication)",
    )
    p.add_argument(
        "--platform", type=str, default=None,
        choices=("cpu", "tpu", "axon"),
        help="force a JAX platform (cpu when the TPU tunnel is down)",
    )
    return p


def _require_matching(cfgs, paths):
    """The scenes share one compiled program: model + train-render settings
    must agree. Compare the dumped sections, report the first offender."""
    from dexnerf_tpu.config import render_settings_from_cfg

    ref_models = cfgs[0].models.dump()
    ref_settings = render_settings_from_cfg(cfgs[0], "train")
    for cfg, path in zip(cfgs[1:], paths[1:]):
        if cfg.models.dump() != ref_models:
            raise SystemExit(
                f"{path}: models section differs from {paths[0]} — "
                "multi-scene training compiles one program across scenes"
            )
        if render_settings_from_cfg(cfg, "train") != ref_settings:
            raise SystemExit(
                f"{path}: nerf.train render settings differ from {paths[0]}"
            )
    return ref_settings


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from dexnerf_tpu.config import load_config
    from dexnerf_tpu.data.pipeline import build_ray_store
    from dexnerf_tpu.parallel import (
        init_multi_scene_state,
        make_multi_scene_parallel_train_step,
        make_multi_scene_train_step,
        make_scene_data_mesh,
        make_scene_mesh,
        scene_params,
        shard_multi_scene,
        stack_params,
        stack_ray_stores,
    )
    from dexnerf_tpu.train import (
        TrainState,
        make_optimizer,
        save_checkpoint,
    )
    from dexnerf_tpu.train.loop import _get, load_scene, setup_models

    paths = args.configs
    cfgs = [load_config(p) for p in paths]
    settings = _require_matching(cfgs, paths)

    stores, params_list, logdirs, scenes = [], [], [], []
    for cfg, path in zip(cfgs, paths):
        scene = load_scene(cfg)
        scenes.append(scene)
        tr = scene.i_train
        stores.append(
            build_ray_store(
                scene.images[tr],
                scene.poses[tr],
                scene.hwf,
                float(cfg.dataset.near),
                float(cfg.dataset.far),
                intrinsics=(
                    scene.intrinsics[tr]
                    if scene.intrinsics is not None
                    else None
                ),
                use_ndc=scene.use_ndc,
            )
        )
        seed = int(_get(cfg.experiment, "randomseed", 42))
        _, _, params = setup_models(cfg, seed)
        params_list.append(params)
        logdir = os.path.join(
            str(cfg.experiment.logdir), str(cfg.experiment.id)
        )
        os.makedirs(logdir, exist_ok=True)
        with open(os.path.join(logdir, "config.yml"), "w") as f:
            f.write(cfg.dump())
        logdirs.append(logdir)

    cfg0 = cfgs[0]
    coarse_fn, fine_fn, _ = setup_models(cfg0, 0)
    tx = make_optimizer(
        float(cfg0.optimizer.lr),
        lr_decay=float(_get(cfg0.scheduler, "lr_decay", 250.0)),
        lr_decay_factor=float(_get(cfg0.scheduler, "lr_decay_factor", 0.1)),
        opt_type=str(_get(cfg0.optimizer, "type", "Adam")),
    )
    batch = args.batch or int(cfg0.nerf.train.num_random_rays)
    iters = (
        args.max_iters
        if args.max_iters is not None
        else int(cfg0.experiment.train_iters)
    )
    spc = args.steps_per_call or int(
        _get(cfg0.nerf.train, "steps_per_call", 1) or 1
    )

    ms = stack_ray_stores(stores)
    state = init_multi_scene_state(stack_params(params_list), tx)
    n_dev = jax.device_count()
    if args.data_devices and args.data_devices > 1:
        k = args.data_devices
        if n_dev % k:
            raise SystemExit(
                f"--data-devices {k} does not divide the {n_dev} available "
                f"devices — {n_dev % k} chips would sit idle"
            )
        n_scene_dev = n_dev // k
        if n_scene_dev < 1 or len(cfgs) % max(n_scene_dev, 1):
            raise SystemExit(
                f"--data-devices {k}: needs {len(cfgs)} scenes divisible "
                f"over {n_dev}//{k} = {n_scene_dev} scene-axis devices"
            )
        mesh = make_scene_data_mesh(n_scene_dev, k)
        state, ms = shard_multi_scene(state, ms, mesh)
        print(
            f"2-D mesh: {len(cfgs)} scenes over {n_scene_dev} scene-devices"
            f" x {k} data-devices each"
        )
        step = make_multi_scene_parallel_train_step(
            mesh, coarse_fn, fine_fn, tx, settings, batch_per_scene=batch,
            steps_per_call=spc,
        )
    else:
        if len(cfgs) % n_dev == 0 and n_dev > 1:
            state, ms = shard_multi_scene(state, ms, make_scene_mesh())
            print(f"sharding {len(cfgs)} scenes over {n_dev} devices")
        step = make_multi_scene_train_step(
            coarse_fn, fine_fn, tx, settings, batch_per_scene=batch,
            steps_per_call=spc,
        )

    metrics_files = [
        open(os.path.join(d, "metrics.jsonl"), "a") for d in logdirs
    ]
    key = jax.random.PRNGKey(int(_get(cfg0.experiment, "randomseed", 42)))
    print_every = int(_get(cfg0.experiment, "print_every", 100) or 100)
    validate_every = int(
        args.validate_every
        if args.validate_every is not None
        else _get(cfg0.experiment, "validate_every", 0) or 0
    )

    def validate_scenes(upto):
        """Full-frame validation per scene: the single-scene ``validate``
        over each scene's own params slice, like the single-scene loop."""
        import imageio.v2 as imageio

        from dexnerf_tpu.train.loop import validate
        from dexnerf_tpu.utils import cast_to_image

        for j, (cfg, scene, logdir, f) in enumerate(
            zip(cfgs, scenes, logdirs, metrics_files)
        ):
            val = validate(
                coarse_fn, fine_fn, scene_params(state.params, j),
                scene, cfg, dex=False, supervision="rgb",
                val_idx=int(
                    scene.i_val[(upto // max(validate_every, 1))
                                % len(scene.i_val)]
                ),
            )
            f.write(json.dumps({
                "step": upto,
                "val_psnr": float(val["psnr"]),
                "val_ssim": float(val["ssim"]),
            }) + "\n")
            f.flush()
            vdir = os.path.join(logdir, "validation")
            os.makedirs(vdir, exist_ok=True)
            imageio.imwrite(
                os.path.join(vdir, f"rgb_{upto:07d}.png"),
                cast_to_image(np.clip(val["rgb"], 0, 1)),
            )
            print(
                f"[val {upto}] s{j}: {val['psnr']:.2f} dB "
                f"ssim {val['ssim']:.3f}",
                flush=True,
            )

    t0 = time.time()
    i = 0
    metrics = None
    while i < iters:
        key, sub = jax.random.split(key)
        state, metrics = step(state, ms, sub)
        last = min(i + spc, iters) - 1
        if validate_every and (
            (last + 1) % validate_every < spc or last == iters - 1
        ):
            validate_scenes(last + 1)
        if (last + 1) % print_every < spc or last == iters - 1:
            loss = np.asarray(metrics["loss"])
            psnr = np.asarray(metrics["psnr"])
            line = " ".join(
                f"s{j}:{loss[j]:.4f}/{psnr[j]:.1f}dB"
                for j in range(len(cfgs))
            )
            print(f"[iter {last + 1}] {line}", flush=True)
            for j, f in enumerate(metrics_files):
                f.write(json.dumps({
                    "step": last + 1,
                    "loss": float(loss[j]),
                    "psnr": float(psnr[j]),
                }) + "\n")
                f.flush()
        i += spc

    jax.block_until_ready(state.params)
    dt = time.time() - t0
    rays_per_sec = len(cfgs) * batch * iters / dt

    for j, logdir in enumerate(logdirs):
        sstate = TrainState(
            step=state.step,
            params=scene_params(state.params, j),
            opt_state=scene_params(state.opt_state, j),
        )
        save_checkpoint(
            os.path.join(logdir, "checkpoints"), int(state.step), sstate,
            extra={
                "loss": float(np.asarray(metrics["loss"])[j]),
                "psnr": float(np.asarray(metrics["psnr"])[j]),
            },
        )
    for f in metrics_files:
        f.close()
    print(
        f"done: {len(cfgs)} scenes x {iters} iters in {dt:.1f}s "
        f"({rays_per_sec:.0f} rays/s aggregate)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
