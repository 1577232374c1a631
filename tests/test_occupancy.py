"""Occupancy-grid-guided rendering (empty-space skipping).

Covers the grid bake (analytic-volume check + dilation), interval
tightening geometry (chord bracketing, miss passthrough), render
equivalence (tightened intervals reproduce the full-interval render, and
beat it at a reduced sample budget), the NDC guard, and the eval CLI.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexnerf_tpu.render import (
    RenderSettings,
    build_occupancy_grid,
    render_image,
    tighten_ray_intervals,
)

SPHERE_R = 0.5


def sphere_field(params, pts, viewdirs):
    """Analytic test field: opaque-ish sphere of radius 0.5 at the origin.

    raw σ is 50 inside / -10 outside (relu'd to 0 by compositing); raw rgb
    is a constant pre-sigmoid 4.0 (≈0.982 after sigmoid).
    """
    del params, viewdirs
    r = jnp.linalg.norm(pts, axis=-1)
    sigma = jnp.where(r < SPHERE_R, 50.0, -10.0)
    rgb = jnp.full((*pts.shape[:-1], 3), 4.0, pts.dtype)
    return jnp.concatenate([rgb, sigma[..., None]], axis=-1)


def _grid(dilate=1, resolution=32, radius=1.0, threshold=1.0):
    return build_occupancy_grid(
        sphere_field,
        None,
        sigma_threshold=threshold,
        center=(0.0, 0.0, 0.0),
        radius=radius,
        resolution=resolution,
        dilate=dilate,
        batch=4096,
    )


def test_build_grid_matches_analytic_volume():
    g = _grid(dilate=0)
    frac = g.occupancy_fraction()
    expect = (4.0 / 3.0) * np.pi * SPHERE_R**3 / (2.0**3)
    assert abs(frac - expect) < 0.25 * expect

    g1 = _grid(dilate=1)
    assert g1.occupancy_fraction() > frac
    g2 = _grid(dilate=2)
    assert g2.occupancy_fraction() > g1.occupancy_fraction()


def test_tighten_brackets_the_chord():
    g = _grid(dilate=1)
    origins = jnp.asarray(
        [[0.0, 0.0, -2.0], [0.0, 2.0, -2.0]], jnp.float32
    )
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], jnp.float32)
    near = jnp.full((2,), 0.5, jnp.float32)
    far = jnp.full((2,), 3.5, jnp.float32)
    n2, f2 = tighten_ray_intervals(
        g, origins, dirs, near, far, num_probes=128
    )
    # hit ray: the sphere chord is [1.5, 2.5]; bracketing includes it with
    # bounded slack (1 dilated cell = 2/32 plus one probe step = 3/128)
    slack = 2.0 / 32 + 3.0 / 128 + 1e-3
    assert float(n2[0]) <= 1.5 and float(n2[0]) >= 1.5 - slack - 2.0 / 32
    assert float(f2[0]) >= 2.5 and float(f2[0]) <= 2.5 + slack + 2.0 / 32
    assert float(f2[0]) - float(n2[0]) < 1.5  # actually tightened
    # miss ray: interval untouched
    assert float(n2[1]) == 0.5 and float(f2[1]) == 3.5


def _sphere_rays(h=12, w=12):
    """Pinhole looking down +z at the sphere from z=-2."""
    focal = 15.0
    ii, jj = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    dirs = np.stack(
        [
            (ii - w / 2.0) / focal,
            (jj - h / 2.0) / focal,
            np.ones_like(ii, np.float32),
        ],
        axis=-1,
    ).astype(np.float32)
    origins = np.broadcast_to(
        np.asarray([0.0, 0.0, -2.0], np.float32), dirs.shape
    )
    return jnp.asarray(origins), jnp.asarray(dirs)


def _render(samples, occupancy=None, near=0.5, far=3.5, subsample=1):
    ro, rd = _sphere_rays()
    s = RenderSettings(
        num_coarse=samples,
        num_fine=0,
        perturb=False,
        radiance_field_noise_std=0.0,
        use_viewdirs=False,
    )
    return render_image(
        None,
        None,
        {"coarse": None},
        ro,
        rd,
        near,
        far,
        s,
        block_size=64,
        coarse_field=sphere_field,
        occupancy=occupancy,
        occupancy_probes=128,
        occupancy_subsample=subsample,
    ).coarse


def test_tightened_render_matches_full_interval():
    g = _grid(dilate=1)
    full = _render(256)
    tight = _render(256, occupancy=g)
    np.testing.assert_allclose(
        np.asarray(tight.rgb), np.asarray(full.rgb), atol=2e-2
    )
    hit = np.asarray(full.accumulation) > 0.9
    assert hit.any()
    d_full = np.asarray(full.depth)[hit]
    d_tight = np.asarray(tight.depth)[hit]
    np.testing.assert_allclose(d_tight, d_full, atol=2e-2)


def test_occupancy_beats_full_interval_at_low_samples():
    """At a cut sample budget, occupancy-tightened sampling is closer to
    the converged render than full-interval sampling — the point of the
    feature."""
    g = _grid(dilate=1)
    ref = np.asarray(_render(1024).depth)
    hit = np.asarray(_render(1024).accumulation) > 0.9
    err_tight = np.abs(np.asarray(_render(24, occupancy=g).depth) - ref)[hit]
    err_full = np.abs(np.asarray(_render(24).depth) - ref)[hit]
    assert err_tight.mean() < 0.5 * err_full.mean()


def test_image_tightening_is_conservative():
    """The subsampled full-frame path (probe every 2nd pixel + 3×3
    min/max window) must only ever WIDEN intervals relative to dense
    per-ray tightening, and its render must still match full-interval."""
    from dexnerf_tpu.render import tighten_image_intervals

    g = _grid(dilate=1)
    ro, rd = _sphere_rays()
    n = ro.reshape(-1, 3).shape[0]
    near = jnp.full((n,), 0.5, jnp.float32)
    far = jnp.full((n,), 3.5, jnp.float32)
    dn, df = tighten_ray_intervals(
        g, ro.reshape(-1, 3), rd.reshape(-1, 3), near, far, num_probes=128
    )
    sn, sf = tighten_image_intervals(
        g, ro.reshape(-1, 3), rd.reshape(-1, 3), near, far, (12, 12),
        num_probes=128, subsample=2,
    )
    # conservative: subsampled near <= dense near on probed pixels is NOT
    # required pointwise (different probe sets), but the subsampled
    # interval must contain the occupied span wherever the dense one does
    hit = np.asarray(df - dn) < 2.9  # rays the dense path tightened
    assert hit.any()
    assert (np.asarray(sn)[hit] <= np.asarray(dn)[hit] + 1e-5).all()
    assert (np.asarray(sf)[hit] >= np.asarray(df)[hit] - 1e-5).all()
    assert (np.asarray(sn) <= np.asarray(sf) + 1e-6).all()

    full = _render(256)
    sub = _render(256, occupancy=g, subsample=2)
    np.testing.assert_allclose(
        np.asarray(sub.rgb), np.asarray(full.rgb), atol=2e-2
    )


def test_ndc_rejected():
    g = _grid(dilate=1)
    ro, rd = _sphere_rays()
    s = RenderSettings(num_coarse=8, num_fine=0, perturb=False,
                       use_viewdirs=False)
    with pytest.raises(ValueError, match="world-space"):
        render_image(
            None, None, {"coarse": None}, ro, rd, 0.5, 3.5, s,
            block_size=64, coarse_field=sphere_field, occupancy=g,
            use_ndc=True, height=12, width=12, focal_length=15.0,
        )


def test_eval_cli_occupancy(tmp_path):
    """apps.eval --occupancy SIGMA --samples C F end-to-end (hermetic)."""
    import yaml

    from dexnerf_tpu.apps.eval import main as eval_main
    from dexnerf_tpu.config import load_config
    from dexnerf_tpu.data import write_blender_dataset
    from dexnerf_tpu.train import init_train_state, make_optimizer
    from dexnerf_tpu.train.checkpoints import save_checkpoint
    from dexnerf_tpu.train.loop import setup_models

    blender_dir = str(tmp_path / "blender")
    write_blender_dataset(
        blender_dir, height=16, width=16, views_per_split=(2, 1, 1)
    )
    cfg_dict = {
        "experiment": {"id": "exp", "logdir": str(tmp_path), "randomseed": 1,
                       "train_iters": 1, "validate_every": 1,
                       "save_every": 1, "print_every": 1},
        "dataset": {"type": "blender", "basedir": blender_dir,
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

    savedir = str(tmp_path / "renders")
    rc = eval_main([
        "--config", cfg_path, "--checkpoint", ckpt_dir,
        "--savedir", savedir, "--num-poses", "1",
        "--occupancy", "0.5", "--occupancy-resolution", "16",
        "--occupancy-radius", "4.0", "--occupancy-probes", "32",
        "--samples", "4", "0",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(savedir, "0000.png"))
