"""Export an Orbax checkpoint to the reference ``.ckpt`` (PyTorch) format.

The inverse of the train/eval CLIs' reference-checkpoint import: a model
trained with this framework can be handed back to the reference stack,
whose ``eval_nerf.py`` renders it and whose training scripts resume from it
(params + Adam moments + iteration; schema per reference
``train_nerf_rgb.py:288-300``).

    python -m dexnerf_tpu.apps.export --config configs/lego.yml \
        --checkpoint logs/lego-lowres/checkpoints \
        --out lego_export.ckpt
"""

import argparse
import os


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    p.add_argument(
        "--checkpoint", type=str, required=True,
        help="Orbax checkpoint path, or a checkpoints/ directory "
        "(picks the latest)",
    )
    p.add_argument("--out", type=str, required=True,
                   help="output .ckpt path (torch pickle)")
    p.add_argument(
        "--platform",
        type=str,
        default=None,
        choices=("cpu", "tpu", "axon"),
        help="force a JAX platform (e.g. cpu when the TPU tunnel is "
        "unavailable); overrides the environment's pinned default",
    )
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from dexnerf_tpu.config import load_config
    from dexnerf_tpu.train import (
        latest_checkpoint,
        make_optimizer,
        restore_checkpoint,
    )
    from dexnerf_tpu.train.checkpoints import export_torch_checkpoint
    from dexnerf_tpu.train.loop import load_scene, setup_models

    cfg = load_config(args.config)
    ckpt = args.checkpoint
    if os.path.isdir(ckpt):
        resolved = latest_checkpoint(ckpt)
        if resolved is not None:
            ckpt = resolved

    # restore against the config's state skeleton so opt_state
    # (ScaleByAdamState etc.) comes back typed, not as raw dicts. The
    # skeleton must MATCH what the run saved: a raw (template-free) probe
    # discovers optional param subtrees (pose twists from --pose-opt,
    # sg_ir shading) and the partitioned optimizer that goes with them.
    _, _, params = setup_models(cfg, int(cfg.experiment.randomseed))
    raw = restore_checkpoint(ckpt)
    raw_params = raw.get("params", {})
    lr = float(cfg.optimizer.lr)
    tx = make_optimizer(
        lr,
        float(cfg.scheduler.lr_decay),
        float(cfg.scheduler.lr_decay_factor),
    )
    if "sg" in raw_params:
        import numpy as np

        params["sg"] = {
            k: np.zeros(np.shape(v), np.float32)
            for k, v in raw_params["sg"].items()
        }
    if "pose" in raw_params:
        import optax

        from dexnerf_tpu.train import make_pose_optimizer
        from dexnerf_tpu.train.pose_opt import init_pose_params
        from dexnerf_tpu.train.step import exponential_decay_schedule

        params["pose"] = init_pose_params(len(raw_params["pose"]))
        tx = make_pose_optimizer(
            tx,
            optax.adam(
                exponential_decay_schedule(
                    float(cfg.optimizer.get("pose_lr", 1e-3)),
                    float(cfg.scheduler.lr_decay),
                    float(cfg.scheduler.lr_decay_factor),
                )
            ),
        )
    from dexnerf_tpu.train import init_train_state

    template = init_train_state(params, tx)
    payload = restore_checkpoint(ckpt, template=template)

    scene = None
    try:
        scene = load_scene(cfg)
    except Exception:
        pass  # hwf is optional in the schema; export works without data

    export_torch_checkpoint(
        args.out,
        payload["params"],
        step=int(payload["step"]),
        opt_state=payload.get("opt_state"),
        use_viewdirs=bool(cfg.nerf.use_viewdirs),
        lr=lr,
        hwf=scene.hwf if scene is not None else None,
    )
    print(f"wrote {args.out} (iter {int(payload['step'])})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
