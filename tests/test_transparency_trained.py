"""The trained-transparency protocol: glass scene, GT, masks, and the tool.

tests/test_transparency.py proves the σ-threshold operator on an analytic
field; this suite covers the TRAINED demonstration's machinery
(data/synthetic.py GLASS scene + first_surface_depth +
tools/transparency_trained_check.py). The converged chip evidence lives in
docs/TRANSPARENCY_TRAINED.json (written by the tool on the TPU); here we
pin the scene physics and the pipeline mechanics at fixture scale.

Reference: ``volume_rendering_utils.py:51-58`` (operator),
``train_dexnerf_rgb.py:393-427`` (sweep + min-abs-err selection).
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from dexnerf_tpu.core.rays import get_ray_bundle_c2w
from dexnerf_tpu.core.volrend import volume_render_radiance_field
from dexnerf_tpu.data.blender import pose_spherical
from dexnerf_tpu.data.synthetic import (
    GLASS_PLANES,
    GLASS_SHELLS,
    GLASS_SPHERES,
    analytic_field,
    first_surface_depth,
    render_analytic_image,
)

NEAR, FAR = 2.0, 6.0
FALLOFF = 40.0
GLASS_KW = dict(
    spheres=GLASS_SPHERES, shells=GLASS_SHELLS, planes=GLASS_PLANES,
    falloff=FALLOFF,
)


@pytest.fixture(scope="module")
def glass_view():
    H = W = 48
    focal = 1.2 * W
    c2w = pose_spherical(30.0, -30.0, 4.0)
    ro, rd = get_ray_bundle_c2w(H, W, focal, jnp.asarray(c2w))
    rgb, d_exp = render_analytic_image(
        c2w, H, W, focal, NEAR, FAR, num_samples=256, **GLASS_KW
    )
    d_gt = first_surface_depth(ro, rd, NEAR, FAR, 512, 1.0, **GLASS_KW)
    d_opq = first_surface_depth(
        ro, rd, NEAR, FAR, 512, 1.0, spheres=GLASS_SPHERES,
        planes=GLASS_PLANES, falloff=FALLOFF,
    )
    glass = (d_gt > 0) & ((d_opq <= 0) | (d_gt < d_opq - 0.05))
    opaque = (d_gt > 0) & (d_opq > 0) & (np.abs(d_gt - d_opq) < 0.02)
    return dict(
        ro=ro, rd=rd, rgb=rgb, d_exp=d_exp, d_gt=d_gt,
        glass=glass, opaque=opaque,
    )


def test_masks_partition_the_view(glass_view):
    g = glass_view
    # the orbit pose sees a real glass region AND real opaque regions
    assert g["glass"].sum() > 200
    assert g["opaque"].sum() > 200
    assert not np.any(g["glass"] & g["opaque"])


def test_first_surface_gt_lands_on_the_shell(glass_view):
    """On glass pixels the GT is the geometric shell intersection: for the
    central ray (through the shell center) depth = |cam - center| - R to
    within the σ-crossing width."""
    g = glass_view
    center, R = np.asarray(GLASS_SHELLS[0][0]), GLASS_SHELLS[0][1]
    # distance from each ray origin to the analytic front intersection,
    # computed geometrically for rays through the glass mask
    ro = np.asarray(g["ro"]).reshape(-1, 3)
    rd = np.asarray(g["rd"]).reshape(-1, 3)
    rdn = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    oc = ro - center
    b = np.einsum("nk,nk->n", oc, rdn)
    disc = b**2 - (np.einsum("nk,nk->n", oc, oc) - R**2)
    hits = disc > 0
    t_geo = (-b - np.sqrt(np.maximum(disc, 0.0)))  # along the UNIT dir
    # convert to z-depth convention (t along the unnormalized dir)
    t_geo = t_geo * np.linalg.norm(rd, axis=-1) ** 0  # unit-dir distance
    scale = np.linalg.norm(rd, axis=-1)
    d_geo = (t_geo / scale).reshape(g["d_gt"].shape)
    mask = g["glass"] & hits.reshape(g["d_gt"].shape)
    assert mask.sum() > 100
    # GT crosses σ=1 slightly OUTSIDE the shell mid-surface; the Gaussian
    # at peak 5 crosses 1 at ~1.8 thicknesses = 0.07 units
    err = np.abs(g["d_gt"] - d_geo)[mask]
    assert np.median(err) < 0.1, np.median(err)


def test_expected_depth_hallucinates_dex_recovers_analytically(glass_view):
    """On the ANALYTIC glass field: expected depth is off by hundreds of
    mm on glass pixels while the σ-threshold depth at a sub-shell-peak
    threshold recovers the first surface to a few mm — the trained run
    (docs/TRANSPARENCY_TRAINED.json) must reproduce this gap."""
    g = glass_view
    err_exp = np.abs(g["d_exp"] - g["d_gt"])
    assert err_exp[g["glass"]].mean() > 0.3  # >300 mm hallucination

    t = jnp.linspace(NEAR, FAR, 256)
    pts = g["ro"][..., None, :] + g["rd"][..., None, :] * t[..., :, None]
    raw = analytic_field(pts, **GLASS_KW)
    z = jnp.broadcast_to(t, (*g["rd"].shape[:-1], 256))
    out = volume_render_radiance_field(
        raw, z, g["rd"], white_background=True, m_thres_cand=(1.0,)
    )
    d_dex = np.asarray(out.depth_dex)[0]
    err_dex = np.abs(d_dex - g["d_gt"])
    assert err_dex[g["glass"]].mean() < 0.02  # < 20 mm
    assert err_dex[g["opaque"]].mean() < 0.02
    # the demonstration gap: an order of magnitude at least
    assert err_exp[g["glass"]].mean() > 10 * err_dex[g["glass"]].mean()


def test_tool_pipeline_smoke(tmp_path):
    """The chip tool runs end to end at fixture scale on CPU: trains a few
    steps, sweeps, selects, writes the JSON artifact with every reported
    block present and finite."""
    from tools.transparency_trained_check import main

    out = tmp_path / "tt.json"
    main([
        "--platform", "cpu", "--size", "20", "--views", "4",
        "--iters", "5", "--samples", "8", "--batch", "128",
        "--m-max", "4.0", "--m-step", "1.0", "--out", str(out),
    ])
    rep = json.loads(out.read_text())
    # round-5 schema: per-seed rows under "runs" + mean/spread "summary"
    assert rep["summary"]["dex_glass_abs_err_mm"] is not None
    assert len(rep["runs"]) == 1
    run = rep["runs"][0]
    for block in ("expected_depth", "dex_depth_best", "confidence",
                  "class_optimal_m"):
        assert block in run
    assert run["n_px"]["glass"] > 0 and run["n_px"]["opaque"] > 0
    # the interior/edge split partitions each class
    assert run["n_px"]["glass"] == (
        run["n_px"]["glass_interior"] + run["n_px"]["glass_edge"]
    )
    assert np.isfinite(run["holdout_psnr_db"])
    assert len(run["sweep"]) == 4
    assert run["best_threshold"] in [s["m"] for s in run["sweep"]]
    for s in run["sweep"]:
        assert np.isfinite(s["abs_err_mm"])
