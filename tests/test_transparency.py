"""The Dex-NeRF namesake capability, demonstrated end to end.

A transparent surface leaves a LOW-but-nonzero σ ridge: alpha-composited
expected depth integrates through it and reports a depth that exists on no
physical surface, while the σ-threshold first-crossing depth (reference
``volume_rendering_utils.py:51-58``) recovers the transparent surface
itself — the entire point of Dex-NeRF (metric depth of transparent objects
for grasping). The depth-confidence channel flags exactly the pixels where
expected depth is untrustworthy. The reference implements the operator but
ships no such verification anywhere.

Built on an analytic σ field (no training) so the geometry is exact.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dexnerf_tpu.core import depth_confidence
from dexnerf_tpu.core.sampling import hierarchical_z_vals, stratified_z_vals
from dexnerf_tpu.render import RenderSettings
from dexnerf_tpu.render.renderer import make_ray_batch, render_rays

Z_SHEET = 2.0  # thin transparent sheet ("glass")
Z_WALL = 4.0  # opaque wall behind it
SIGMA_SHEET = 8.0  # low density: partially transmissive at fine dists
SIGMA_WALL = 500.0
NEAR, FAR = 0.5, 5.0


def _glass_field(params, pts, viewdirs):
    """Raw [..., 4] radiance field: a low-σ sheet at Z_SHEET covering
    x < 0.5 only, plus an opaque wall at Z_WALL everywhere."""
    z = pts[..., 2]
    x = pts[..., 0]
    sheet = (
        SIGMA_SHEET
        * jnp.exp(-((z - Z_SHEET) ** 2) / (2 * 0.03**2))
        * (x < 0.5)
    )
    wall = SIGMA_WALL * (z > Z_WALL)
    sigma = sheet + wall
    rgb_logit = jnp.zeros(pts.shape[:-1] + (3,))  # mid-gray everywhere
    return jnp.concatenate([rgb_logit, sigma[..., None]], axis=-1)


@pytest.fixture(scope="module")
def rendered():
    settings = RenderSettings(
        num_coarse=64,
        num_fine=64,
        perturb=False,
        lindisp=False,
        radiance_field_noise_std=0.0,
        white_background=False,
        m_thres_cand=(4.0,),
        use_viewdirs=False,
        num_encoding_fn_xyz=0,
        num_encoding_fn_dir=0,
        include_input_xyz=True,
        include_input_dir=False,
        log_sampling_xyz=True,
        log_sampling_dir=True,
    )
    # ray 0 passes through sheet + wall (x=0); ray 1 hits the wall only
    origins = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    directions = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    rays = make_ray_batch(origins, directions, NEAR, FAR)
    out = render_rays(
        None, None, {"coarse": {}, "fine": {}}, rays, None, settings,
        coarse_field=_glass_field, fine_field=_glass_field,
    )
    # reconstruct the fine-pass z-values exactly as eval/serve do
    z_c = stratified_z_vals(rays.near, rays.far, 64, lindisp=False)
    z_m, _ = hierarchical_z_vals(None, z_c, out.coarse.weights, 64, det=True)
    return out, np.asarray(z_m)


def test_expected_depth_hallucinates_through_glass(rendered):
    out, _ = rendered
    d_exp = np.asarray(out.fine.depth)
    # the glass ray's expected depth lands BETWEEN the surfaces — on
    # neither of them (the transparent-object failure mode)
    assert Z_SHEET + 0.3 < d_exp[0] < Z_WALL - 0.1, d_exp
    # the opaque ray is fine: expected depth ~ the wall
    assert abs(d_exp[1] - Z_WALL) < 0.1, d_exp


def test_dex_threshold_depth_recovers_the_glass(rendered):
    out, _ = rendered
    d_dex = np.asarray(out.fine.depth_dex)[0]  # threshold m=4 < SIGMA_SHEET
    assert abs(d_dex[0] - Z_SHEET) < 0.1, d_dex
    # behind-glass-only rays cross at the wall
    assert abs(d_dex[1] - Z_WALL) < 0.1, d_dex


def test_confidence_flags_the_hallucinated_depth(rendered):
    out, z_m = rendered
    w = np.asarray(out.fine.weights)
    d_exp = np.asarray(out.fine.depth)
    d_dex = np.asarray(out.fine.depth_dex)[0]

    conf_exp = np.asarray(depth_confidence(w, z_m, d_exp, 0.2))
    conf_dex = np.asarray(depth_confidence(w, z_m, d_dex, 0.2))
    # glass ray: no weight mass anywhere near the averaged depth
    assert conf_exp[0] < 0.1, conf_exp
    # ...while the σ-threshold depth sits on a real (partial) surface
    assert conf_dex[0] > 0.2, conf_dex
    # opaque ray: expected depth is trustworthy and says so
    assert conf_exp[1] > 0.9, conf_exp


def test_transmittance_split_is_physical(rendered):
    out, z_m = rendered
    w = np.asarray(out.fine.weights)
    # the glass ray's weight splits between sheet and wall; both surfaces
    # carry real mass and they sum to ~full accumulation
    sheet_mass = w[0][np.abs(z_m[0] - Z_SHEET) < 0.2].sum()
    wall_mass = w[0][z_m[0] > Z_WALL - 0.05].sum()
    assert sheet_mass > 0.15 and wall_mass > 0.3
    acc = np.asarray(out.fine.accumulation)
    np.testing.assert_allclose(sheet_mass + wall_mass, acc[0], atol=0.05)
