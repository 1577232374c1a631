"""σ-isosurface mesh export from a checkpoint (marching tetrahedra).

Extracts the density field's σ = m surface — the same threshold family
as the Dex-NeRF depth (reference ``volume_rendering_utils.py:51-58``) —
as a triangle mesh (ASCII PLY)::

    python -m dexnerf_tpu.apps.mesh --config configs/lego.yml \
        --checkpoint logs/lego/checkpoints --out lego.ply \
        --sigma-threshold 15 --resolution 128 --radius 1.5

The σ grid is evaluated on-device in fixed-size batches through the same
field function the renderer uses (fine params when present); extraction
runs on the host (``utils/mesh.py`` — dependency-free marching
tetrahedra with gradient-oriented winding). The reference computes depth
maps from σ but never exports geometry; grasp planners want meshes.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--out", type=str, default="mesh.ply")
    p.add_argument(
        "--sigma-threshold", type=float, default=15.0,
        help="σ isovalue m (the Dex-NeRF threshold family; the depth "
        "sweep's best threshold is a good choice)",
    )
    p.add_argument(
        "--resolution", type=int, default=128,
        help="grid resolution per axis",
    )
    p.add_argument(
        "--radius", type=float, default=1.5,
        help="half-extent of the sampled cube around --center",
    )
    p.add_argument(
        "--center", type=float, nargs=3, default=(0.0, 0.0, 0.0),
        help="world-space center of the sampled cube",
    )
    p.add_argument(
        "--batch", type=int, default=65536,
        help="grid points per device batch",
    )
    p.add_argument(
        "--platform", type=str, default=None,
        choices=("cpu", "tpu", "axon"),
        help="force a JAX platform (cpu when the TPU tunnel is down)",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dexnerf_tpu.config import load_config, render_settings_from_cfg
    from dexnerf_tpu.render.renderer import make_mlp_field
    from dexnerf_tpu.train.loop import load_eval_params, setup_models
    from dexnerf_tpu.utils.mesh import marching_tetrahedra, write_ply_mesh

    cfg = load_config(args.config)
    cfg, params, _, _ = load_eval_params(cfg, args.checkpoint)
    coarse_fn, fine_fn, _ = setup_models(cfg, int(cfg.experiment.randomseed))

    s = render_settings_from_cfg(cfg, "validation").eval_variant()
    use_fine = "fine" in params and fine_fn is not None
    field = make_mlp_field(fine_fn if use_fine else coarse_fn, s)
    fparams = params["fine"] if use_fine else params["coarse"]
    print(f"sampling σ on a {args.resolution}^3 grid "
          f"({'fine' if use_fine else 'coarse'} field)")

    from dexnerf_tpu.render.occupancy import eval_sigma_grid

    n = args.resolution
    spacing = 2.0 * float(args.radius) / max(n - 1, 1)
    center = np.asarray(args.center, np.float32)

    t0 = time.time()
    # corner NODES, not cell centers: marching tetrahedra interpolates
    # between lattice nodes, so the nodes must span the cube inclusively
    sigma = np.asarray(eval_sigma_grid(
        field, fparams, center=tuple(center), radius=float(args.radius),
        resolution=n, batch=int(args.batch), style="corners",
    ))
    print(f"σ grid in {time.time()-t0:.1f}s (min {sigma.min():.2f}, "
          f"max {sigma.max():.1f}, mean {sigma.mean():.2f})")

    verts, faces = marching_tetrahedra(
        sigma, float(args.sigma_threshold),
        origin=tuple(center - args.radius),
        spacing=(spacing,) * 3,
    )
    if verts.shape[0] == 0:
        print(
            f"no surface at σ = {args.sigma_threshold} — pick an isovalue "
            f"inside the grid's range [{sigma.min():.2f}, "
            f"{sigma.max():.2f}], or change --radius/--center"
        )
        return 1
    write_ply_mesh(args.out, verts, faces)
    print(f"wrote {args.out}: {verts.shape[0]} vertices, "
          f"{faces.shape[0]} faces")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
