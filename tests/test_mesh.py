"""Marching-tetrahedra mesh extraction (utils/mesh.py) + apps.mesh CLI."""

import os

import numpy as np
import pytest

from dexnerf_tpu.utils.mesh import marching_tetrahedra, write_ply_mesh


def _sphere_grid(n=40, R=0.8, extent=1.2):
    lin = np.linspace(-extent, extent, n).astype(np.float32)
    g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
    vals = R - np.linalg.norm(g, axis=-1)
    return vals, lin, R


def test_sphere_surface_geometry_and_topology():
    vals, lin, R = _sphere_grid()
    sp = float(lin[1] - lin[0])
    verts, faces = marching_tetrahedra(
        vals, 0.0, origin=(lin[0],) * 3, spacing=(sp,) * 3
    )
    assert verts.shape[0] > 1000 and faces.shape[0] > 1000
    # every vertex sits on the sphere to within a fraction of a cell
    r = np.linalg.norm(verts, axis=1)
    assert float(np.abs(r - R).max()) < 0.1 * sp
    # surface area within 1% of analytic
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()
    assert abs(area - 4 * np.pi * R * R) / (4 * np.pi * R * R) < 0.01
    # closed surface: (almost) every edge shared by exactly 2 faces
    edges = np.sort(
        np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]),
        axis=1,
    )
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.995
    # consistent OUTWARD winding: signed volume ~ sphere volume (a mixed
    # winding cancels to ~0)
    vol = np.einsum("ij,ij->i", a, np.cross(b, c)).sum() / 6.0
    assert abs(vol - 4 / 3 * np.pi * R**3) / (4 / 3 * np.pi * R**3) < 0.01


def test_origin_spacing_placement():
    vals, lin, R = _sphere_grid(n=24)
    sp = float(lin[1] - lin[0])
    shift = np.asarray([10.0, -5.0, 2.0], np.float32)
    verts, _ = marching_tetrahedra(
        vals, 0.0, origin=tuple(lin[0] + shift), spacing=(sp,) * 3
    )
    r = np.linalg.norm(verts - shift, axis=1)
    assert float(np.abs(r - R).max()) < 0.02


def test_empty_and_full_grids():
    vals = np.zeros((8, 8, 8), np.float32)
    verts, faces = marching_tetrahedra(vals, 1.0)
    assert verts.shape == (0, 3) and faces.shape == (0, 3)
    verts, faces = marching_tetrahedra(vals + 5.0, 1.0)  # all inside
    assert faces.shape[0] == 0


def test_ply_mesh_roundtrip(tmp_path):
    vals, lin, _ = _sphere_grid(n=16)
    sp = float(lin[1] - lin[0])
    verts, faces = marching_tetrahedra(
        vals, 0.0, origin=(lin[0],) * 3, spacing=(sp,) * 3
    )
    path = str(tmp_path / "m.ply")
    write_ply_mesh(path, verts, faces)
    with open(path) as f:
        txt = f.read().splitlines()
    assert txt[0] == "ply"
    nv = int(next(l for l in txt if l.startswith("element vertex")).split()[-1])
    nf = int(next(l for l in txt if l.startswith("element face")).split()[-1])
    assert nv == verts.shape[0] and nf == faces.shape[0]
    hdr = txt.index("end_header")
    first_face = txt[hdr + 1 + nv].split()
    assert first_face[0] == "3" and len(first_face) == 4


def test_mesh_cli_e2e(tmp_path):
    """apps.mesh exports a PLY from an (untrained) checkpoint: the random
    field's tiny positive-σ region still yields a surface at a low iso."""
    import yaml

    from dexnerf_tpu.apps.mesh import main as mesh_main
    from dexnerf_tpu.train import init_train_state, make_optimizer
    from dexnerf_tpu.train.checkpoints import save_checkpoint
    from dexnerf_tpu.config import load_config
    from dexnerf_tpu.train.loop import setup_models

    cfg_dict = {
        "experiment": {"id": "exp", "logdir": str(tmp_path), "randomseed": 1,
                       "train_iters": 1, "validate_every": 1,
                       "save_every": 1, "print_every": 1},
        "dataset": {"type": "blender", "basedir": str(tmp_path / "none"),
                    "near": 2.0, "far": 6.0, "no_ndc": True},
        "models": {
            "coarse": {"type": "FlexibleNeRFModel", "num_layers": 2,
                       "hidden_size": 16, "num_encoding_fn_xyz": 2,
                       "num_encoding_fn_dir": 1},
        },
        "optimizer": {"type": "Adam", "lr": 5.0e-3},
        "scheduler": {"lr_decay": 250, "lr_decay_factor": 0.1},
        "nerf": {
            "use_viewdirs": True,
            "train": {"num_random_rays": 16, "chunksize": 64,
                      "perturb": True, "num_coarse": 4, "num_fine": 0,
                      "white_background": False,
                      "radiance_field_noise_std": 0.0, "lindisp": False},
            "validation": {"chunksize": 64, "perturb": False,
                           "num_coarse": 4, "num_fine": 0,
                           "white_background": False,
                           "radiance_field_noise_std": 0.0,
                           "lindisp": False},
        },
    }
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict, f)
    cfg = load_config(cfg_path)
    _, _, params = setup_models(cfg, 1)
    state = init_train_state(params, make_optimizer(5e-3))
    ckpt_dir = str(tmp_path / "checkpoints")
    save_checkpoint(ckpt_dir, 1, state)

    out = str(tmp_path / "mesh.ply")
    rc = mesh_main([
        "--config", cfg_path, "--checkpoint", ckpt_dir, "--out", out,
        "--sigma-threshold", "0.4", "--resolution", "24",
        "--batch", "4096",
    ])
    assert rc == 0
    with open(out) as f:
        head = [next(f) for _ in range(8)]
    assert head[0].strip() == "ply"
    nv = int(next(l for l in head if "element vertex" in l).split()[-1])
    assert nv > 0
