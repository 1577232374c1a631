"""Golden/property tests for the pure functional core.

Expected values are computed with independent numpy formulations (and, where
cheap, compared against torch-CPU equivalents of the reference math built
from the published equations — not from reference code).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dexnerf_tpu.core import (
    cumprod_exclusive,
    encoding_dim,
    get_ray_bundle_c2w,
    get_ray_bundle_w2c,
    img2mse,
    mse2psnr,
    ndc_rays,
    perturb_z_vals,
    positional_encoding,
    sample_pdf,
    searchsorted_right,
    sigma_threshold_depth,
    sigma_to_weights,
    stratified_z_vals,
    volume_render_radiance_field,
    weights_to_cdf,
)
from dexnerf_tpu.core.metrics import ScalarMetric, compute_err_metric, depth_error_img


# ---------------------------------------------------------------- encoding

def test_positional_encoding_layout():
    x = jnp.array([[0.5, -0.25, 1.0]])
    out = positional_encoding(x, num_frequencies=2, include_input=True)
    assert out.shape == (1, encoding_dim(3, 2, True)) == (1, 15)
    np.testing.assert_allclose(out[:, :3], x, rtol=1e-6)
    # frequency-major: [x, sin(1*x), cos(1*x), sin(2*x), cos(2*x)]
    np.testing.assert_allclose(out[0, 3:6], np.sin(np.asarray(x[0])), rtol=1e-6)
    np.testing.assert_allclose(out[0, 6:9], np.cos(np.asarray(x[0])), rtol=1e-6)
    np.testing.assert_allclose(out[0, 9:12], np.sin(2 * np.asarray(x[0])), rtol=1e-6)
    np.testing.assert_allclose(out[0, 12:15], np.cos(2 * np.asarray(x[0])), rtol=1e-6)


def test_positional_encoding_no_input_no_freq():
    x = jnp.ones((4, 3))
    assert positional_encoding(x, num_frequencies=0).shape == (4, 3)
    out = positional_encoding(x, num_frequencies=3, include_input=False)
    assert out.shape == (4, 18)


def test_positional_encoding_linear_sampling():
    x = jnp.array([[1.0]])
    out = positional_encoding(x, num_frequencies=3, include_input=False,
                              log_sampling=False)
    # linear bands between 2^0=1 and 2^2=4: [1, 2.5, 4]
    np.testing.assert_allclose(
        out[0], [np.sin(1), np.cos(1), np.sin(2.5), np.cos(2.5),
                 np.sin(4.0), np.cos(4.0)], rtol=1e-5)


# ---------------------------------------------------------------- rays

def test_ray_bundle_c2w_identity_pose():
    H, W, f = 4, 6, 10.0
    ro, rd = get_ray_bundle_c2w(H, W, f, jnp.eye(4))
    assert ro.shape == (H, W, 3) and rd.shape == (H, W, 3)
    np.testing.assert_allclose(ro, 0.0)
    # pixel (row j=1, col i=2): dir = ((2-3)/10, -(1-2)/10, -1)
    np.testing.assert_allclose(rd[1, 2], [-0.1, 0.1, -1.0], atol=1e-6)


def test_ray_bundle_c2w_rotation():
    H, W, f = 3, 3, 5.0
    # 90-degree rotation about z
    c2w = jnp.array(
        [[0.0, -1, 0, 1], [1, 0, 0, 2], [0, 0, 1, 3], [0, 0, 0, 1]]
    )
    ro, rd = get_ray_bundle_c2w(H, W, f, c2w)
    np.testing.assert_allclose(ro[0, 0], [1.0, 2.0, 3.0], atol=1e-6)
    # direction for center pixel (i=1.5 offset): check via manual matmul
    d_cam = np.array([(0 - 1.5) / 5.0, -(0 - 1.5) / 5.0, -1.0])
    expected = np.asarray(c2w[:3, :3]) @ d_cam
    np.testing.assert_allclose(rd[0, 0], expected, atol=1e-6)


def test_ray_bundle_w2c_identity():
    H, W = 4, 4
    K = jnp.array([[8.0, 0, 2.0], [0, 9.0, 1.5], [0, 0, 1]])
    ro, rd = get_ray_bundle_w2c(H, W, jnp.eye(4), K)
    np.testing.assert_allclose(ro, 0.0, atol=1e-6)
    # fx used for BOTH axes (reference quirk): pixel (j=2, i=3)
    np.testing.assert_allclose(
        rd[2, 3], [(3 - 2.0) / 8.0, (2 - 1.5) / 8.0, 1.0], atol=1e-6
    )
    # honest-fy variant
    _, rd2 = get_ray_bundle_w2c(H, W, jnp.eye(4), K, fx_for_both_axes=False)
    np.testing.assert_allclose(
        rd2[2, 3], [(3 - 2.0) / 8.0, (2 - 1.5) / 9.0, 1.0], atol=1e-6
    )


def test_ray_bundle_w2c_pose_inversion():
    H, W = 2, 2
    K = jnp.array([[5.0, 0, 1.0], [0, 5.0, 1.0], [0, 0, 1]])
    # w2c with translation: camera center should be -R^T t
    R = np.array([[0.0, 1, 0], [-1, 0, 0], [0, 0, 1]])
    t = np.array([1.0, 2.0, 3.0])
    w2c = np.eye(4)
    w2c[:3, :3] = R
    w2c[:3, 3] = t
    ro, rd = get_ray_bundle_w2c(H, W, jnp.asarray(w2c), K)
    center = -R.T @ t
    np.testing.assert_allclose(ro[0, 0], center, atol=1e-5)
    d_cam = np.array([(0 - 1.0) / 5.0, (0 - 1.0) / 5.0, 1.0])
    # reference contraction: d_world[r] = sum_c d_cam[c] * inv(R)[r, c]
    expected = np.linalg.inv(R) @ d_cam
    np.testing.assert_allclose(rd[0, 0], expected, atol=1e-5)


def test_ndc_rays_z_mapping():
    H, W, f = 8, 8, 10.0
    ro = jnp.array([[0.0, 0.0, -1.0]])
    rd = jnp.array([[0.0, 0.0, -1.0]])
    o, d = ndc_rays(H, W, f, 1.0, ro, rd)
    # At the near plane z=-1: o2 = 1 + 2*near/oz = 1 - 2 = -1
    np.testing.assert_allclose(o[0, 2], -1.0, atol=1e-6)
    # d2 = -2*near/oz = 2  => o2 + d2 = 1 at infinity
    np.testing.assert_allclose(d[0, 2], 2.0, atol=1e-6)


def test_ndc_t_to_world_depth_inverts_projection():
    """NDC preserves straight lines, so a sample at NDC parameter t lies
    on the original world ray; converting t must recover the Euclidean
    distance from the world ray origin to that point."""
    from dexnerf_tpu.core import ndc_t_to_world_depth

    H, W, f, near = 12, 16, 20.0, 1.0
    rng = np.random.default_rng(3)
    # forward-facing camera-ish rays: origins near z=0, directions with
    # dz < 0 (looking down -z, the LLFF convention)
    ro = rng.uniform(-0.2, 0.2, (5, 3)).astype(np.float32)
    rd = np.stack(
        [
            rng.uniform(-0.3, 0.3, 5),
            rng.uniform(-0.3, 0.3, 5),
            -np.ones(5),
        ],
        axis=-1,
    ).astype(np.float32)
    t = rng.uniform(0.05, 0.95, (5,)).astype(np.float32)

    got = np.asarray(
        ndc_t_to_world_depth(jnp.asarray(t), jnp.asarray(ro),
                             jnp.asarray(rd), H, W, f, near)
    )

    # independent expectation: find the NDC sample's z, invert the z map
    # (z' = 1 + 2n/z), then walk the ORIGINAL ray to that world z
    o_ndc, d_ndc = ndc_rays(H, W, f, near, jnp.asarray(ro), jnp.asarray(rd))
    pz = np.asarray(o_ndc)[:, 2] + t * np.asarray(d_ndc)[:, 2]
    z_world = 2.0 * near / (pz - 1.0)
    u = (z_world - ro[:, 2]) / rd[:, 2]
    p_world = ro + u[:, None] * rd
    expected = np.linalg.norm(p_world - ro, axis=-1)
    np.testing.assert_allclose(got, expected, rtol=1e-4)

    # t=0 is the near-plane intersection of the ray
    d0 = np.asarray(
        ndc_t_to_world_depth(jnp.zeros(5), jnp.asarray(ro),
                             jnp.asarray(rd), H, W, f, near)
    )
    u_near = -(near + ro[:, 2]) / rd[:, 2]
    np.testing.assert_allclose(
        d0, u_near * np.linalg.norm(rd, axis=-1), rtol=1e-4
    )

    # threshold-swept shapes broadcast: [T, N] against [N, 3] rays
    t2 = np.stack([t, t * 0.5], axis=0)
    got2 = np.asarray(
        ndc_t_to_world_depth(jnp.asarray(t2), jnp.asarray(ro),
                             jnp.asarray(rd), H, W, f, near)
    )
    assert got2.shape == (2, 5)
    np.testing.assert_allclose(got2[0], got, rtol=1e-5)
    # t=1 (the far plane at infinity) stays finite via the clamp
    d1 = np.asarray(
        ndc_t_to_world_depth(jnp.ones(5), jnp.asarray(ro),
                             jnp.asarray(rd), H, W, f, near)
    )
    assert np.all(np.isfinite(d1))


# ---------------------------------------------------------------- sampling

def test_stratified_z_vals_linear_and_lindisp():
    near = jnp.array([2.0])
    far = jnp.array([6.0])
    z = stratified_z_vals(near, far, 5)
    np.testing.assert_allclose(z[0], [2, 3, 4, 5, 6], atol=1e-6)
    zd = stratified_z_vals(near, far, 3, lindisp=True)
    np.testing.assert_allclose(
        zd[0], 1.0 / np.array([1 / 2.0, (1 / 2.0 + 1 / 6.0) / 2, 1 / 6.0]), atol=1e-6
    )


def test_perturb_z_vals_within_bins():
    key = jax.random.PRNGKey(0)
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 8), (16, 8))
    zp = perturb_z_vals(key, z)
    assert zp.shape == z.shape
    mids = 0.5 * (z[..., 1:] + z[..., :-1])
    upper = np.concatenate([mids, z[..., -1:]], -1)
    lower = np.concatenate([z[..., :1], mids], -1)
    assert np.all(np.asarray(zp) >= lower - 1e-6)
    assert np.all(np.asarray(zp) <= upper + 1e-6)


def test_searchsorted_right_matches_numpy():
    rng = np.random.RandomState(0)
    cdf = np.sort(rng.rand(5, 9), axis=-1).astype(np.float32)
    u = rng.rand(5, 7).astype(np.float32)
    got = searchsorted_right(jnp.asarray(cdf), jnp.asarray(u))
    for b in range(5):
        expected = np.searchsorted(cdf[b], u[b], side="right")
        np.testing.assert_array_equal(np.asarray(got[b]), expected)


def test_searchsorted_right_ties():
    cdf = jnp.array([[0.0, 0.5, 0.5, 1.0]])
    u = jnp.array([[0.5, 0.0, 1.0]])
    got = np.asarray(searchsorted_right(cdf, u))
    np.testing.assert_array_equal(got[0], [3, 1, 4])


def test_weights_to_cdf():
    w = jnp.array([[1.0, 2.0, 1.0]])
    cdf = np.asarray(weights_to_cdf(w))
    assert cdf.shape == (1, 4)
    np.testing.assert_allclose(cdf[0, 0], 0.0)
    np.testing.assert_allclose(cdf[0, -1], 1.0, rtol=1e-5)
    assert np.all(np.diff(cdf[0]) >= 0)


def test_sample_pdf_deterministic_uniform_weights():
    # Uniform weights over bins [0,1] with det=True: samples are ~linspace.
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (4, 9))
    weights = jnp.ones((4, 8))
    s = sample_pdf(bins, weights, 16, det=True)
    assert s.shape == (4, 16)
    np.testing.assert_allclose(np.asarray(s[0]), np.linspace(0, 1, 16), atol=1e-3)


def test_sample_pdf_concentrates_mass():
    # All mass in bin 3 of 8 -> samples land inside that bin.
    bins = jnp.broadcast_to(jnp.linspace(0.0, 8.0, 9), (2, 9))
    weights = jnp.zeros((2, 8)).at[:, 3].set(100.0)
    key = jax.random.PRNGKey(1)
    s = np.asarray(sample_pdf(bins, weights, 64, key))
    frac_inside = np.mean((s >= 3.0) & (s <= 4.0))
    assert frac_inside > 0.95


def test_sample_pdf_sorted_bins_output_in_range():
    rng = np.random.RandomState(3)
    bins = np.sort(rng.rand(8, 11) * 5, axis=-1).astype(np.float32)
    weights = rng.rand(8, 10).astype(np.float32)
    s = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 32,
                              jax.random.PRNGKey(2)))
    assert np.all(s >= bins[:, :1] - 1e-5)
    assert np.all(s <= bins[:, -1:] + 1e-5)


# ---------------------------------------------------------------- volrend

def test_cumprod_exclusive():
    x = jnp.array([[2.0, 3.0, 4.0]])
    np.testing.assert_allclose(np.asarray(cumprod_exclusive(x))[0], [1, 2, 6])


def test_sigma_to_weights_opaque_first_sample():
    sigma = jnp.array([[1e8, 1e8, 1e8]])
    dists = jnp.ones((1, 3))
    w = np.asarray(sigma_to_weights(sigma, dists))
    np.testing.assert_allclose(w[0], [1.0, 0.0, 0.0], atol=1e-6)


def test_volume_render_against_manual():
    # 1 ray, 3 samples; manual emission-absorption computation.
    rng = np.random.RandomState(0)
    raw = rng.randn(1, 3, 4).astype(np.float32)
    z = np.array([[1.0, 2.0, 3.0]], dtype=np.float32)
    rd = np.array([[0.0, 0.0, 2.0]], dtype=np.float32)  # norm 2 scales dists

    out = volume_render_radiance_field(
        jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd)
    )

    dists = np.array([1.0, 1.0, 1e10]) * 2.0
    sigma = np.maximum(raw[0, :, 3], 0.0)
    alpha = 1 - np.exp(-sigma * dists)
    trans = np.cumprod(np.concatenate([[1.0], 1 - alpha + 1e-10]))[:-1]
    wts = alpha * trans
    rgb = 1 / (1 + np.exp(-raw[0, :, :3]))
    np.testing.assert_allclose(np.asarray(out.rgb[0]), wts @ rgb, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.depth[0]), np.sum(wts * z[0]),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.accumulation[0]), wts.sum(),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.weights[0]), wts, rtol=1e-4)


def test_volume_render_white_background():
    raw = jnp.full((1, 2, 4), -100.0)  # zero density, sigmoid(rgb)~0
    z = jnp.array([[1.0, 2.0]])
    rd = jnp.array([[0.0, 0.0, 1.0]])
    out = volume_render_radiance_field(raw, z, rd, white_background=True)
    np.testing.assert_allclose(np.asarray(out.rgb[0]), [1.0, 1.0, 1.0], atol=1e-4)


def test_volume_render_noise_key_required():
    raw = jnp.zeros((1, 2, 4))
    z = jnp.array([[1.0, 2.0]])
    rd = jnp.array([[0.0, 0.0, 1.0]])
    with pytest.raises(ValueError):
        volume_render_radiance_field(raw, z, rd, radiance_field_noise_std=0.5)
    out = volume_render_radiance_field(
        raw, z, rd, radiance_field_noise_std=0.5, noise_key=jax.random.PRNGKey(0)
    )
    assert out.rgb.shape == (1, 3)


def test_sigma_threshold_depth_first_crossing():
    sigma = jnp.array([[0.0, 3.0, 10.0, 2.0], [0.0, 0.0, 0.0, 0.0]])
    z = jnp.array([[1.0, 2.0, 3.0, 4.0], [1.0, 2.0, 3.0, 4.0]])
    d = np.asarray(sigma_threshold_depth(sigma, z, [2.5, 5.0]))
    assert d.shape == (2, 2)
    # threshold 2.5: ray0 first crossing at sample 1 (z=2); ray1 none -> z[0]=1
    np.testing.assert_allclose(d[0], [2.0, 1.0])
    # threshold 5.0: ray0 first crossing at sample 2 (z=3)
    np.testing.assert_allclose(d[1], [3.0, 1.0])


def test_volume_render_dex_depth_plumbed():
    raw = jnp.zeros((5, 4, 4)).at[:, 2, 3].set(50.0)
    z = jnp.broadcast_to(jnp.array([1.0, 2.0, 3.0, 4.0]), (5, 4))
    rd = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (5, 3))
    out = volume_render_radiance_field(raw, z, rd, m_thres_cand=(5.0, 10.0))
    assert out.depth_dex.shape == (2, 5)
    np.testing.assert_allclose(np.asarray(out.depth_dex), 3.0)


# ---------------------------------------------------------------- metrics

def test_img2mse_psnr():
    a = jnp.zeros((4, 3))
    b = jnp.ones((4, 3)) * 0.5
    mse = float(img2mse(a, b))
    np.testing.assert_allclose(mse, 0.25)
    np.testing.assert_allclose(mse2psnr(mse), -10 * np.log10(0.25))
    assert mse2psnr(0.0) == -10 * np.log10(1e-5)


def test_compute_err_metric():
    gt = jnp.array([[1.0, 1.0, 1.0, 1.0]])
    pred = jnp.array([[1.0, 1.003, 1.005, 1.010]])
    mask = jnp.array([[True, True, True, True]])
    err = compute_err_metric(gt, pred, mask)
    np.testing.assert_allclose(err["depth_abs_err"], 4.5, rtol=1e-4)
    # rmse = sqrt(mean([0, 9, 25, 100] mm^2)) = sqrt(33.5)
    np.testing.assert_allclose(
        err["depth_rmse"], float(np.sqrt(33.5)), rtol=1e-4
    )
    np.testing.assert_allclose(err["depth_err2"], 0.75)
    np.testing.assert_allclose(err["depth_err4"], 0.5)
    np.testing.assert_allclose(err["depth_err8"], 0.25)


def test_depth_error_img_shapes_and_legend():
    gt = np.ones((1, 32, 240), np.float32)
    est = gt + 0.5
    mask = np.ones_like(gt, bool)
    img = depth_error_img(est, gt, mask)
    assert img.shape == (32, 240, 3)
    # legend bands stamped top-left
    assert img[:10, :20].std() == 0


def test_scalar_metric():
    m = ScalarMetric()
    assert m.peek() == 0.0
    m.update(1.0)
    m.update(3.0)
    assert m.peek() == 2.0
    m.reset()
    assert m.peek() == 0.0


def test_transparent_object_dex_vs_expected_depth():
    """The Dex-NeRF claim (paper §1, reference volume_rendering_utils.py:51-58):
    for a TRANSPARENT surface — low density at the surface, solid background
    behind it — the alpha-composited EXPECTED depth lands near the opaque
    background, while the σ-threshold first-crossing depth recovers the
    transparent surface itself."""
    import jax.numpy as jnp

    from dexnerf_tpu.core.volrend import (
        ray_dists,
        sigma_threshold_depth,
        sigma_to_weights,
    )

    S = 64
    z = jnp.linspace(1.0, 5.0, S)[None, :]  # one ray
    glass_z, wall_z = 2.0, 4.0
    # glass: weak density bump (transmits most light);
    # wall: strong density (absorbs the rest)
    sigma = 8.0 * jnp.exp(-((z - glass_z) ** 2) / 1e-3) + 400.0 * (
        z > wall_z
    ).astype(jnp.float32)
    dirs = jnp.asarray([[0.0, 0.0, 1.0]])
    w = sigma_to_weights(sigma, ray_dists(z, dirs))
    expected_depth = float(
        (jnp.sum(w * z, axis=-1) / jnp.sum(w, axis=-1))[0]
    )
    dex_depth = float(sigma_threshold_depth(sigma, z, [5.0])[0][0])

    # expected depth is pulled toward the wall; the σ-threshold depth
    # finds the glass surface
    assert abs(dex_depth - glass_z) < 0.1, dex_depth
    assert expected_depth - glass_z > 0.5, expected_depth
    assert abs(expected_depth - wall_z) < 1.0, expected_depth


def test_ssim_identity_and_ordering():
    from dexnerf_tpu.core.metrics import ssim

    rng = np.random.RandomState(0)
    img = rng.rand(32, 32, 3).astype(np.float32)
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-6)
    # more noise -> lower ssim, and any distortion < 1
    small = np.clip(img + 0.05 * rng.randn(32, 32, 3), 0, 1).astype(np.float32)
    large = np.clip(img + 0.30 * rng.randn(32, 32, 3), 0, 1).astype(np.float32)
    s_small, s_large = float(ssim(img, small)), float(ssim(img, large))
    assert 0.0 < s_large < s_small < 1.0, (s_small, s_large)
    # grayscale [H, W] input accepted
    assert float(ssim(img[..., 0], img[..., 0])) == pytest.approx(1.0, abs=1e-6)


def test_ssim_matches_direct_numpy_windows():
    """Cross-check the conv implementation against a literal sliding-window
    evaluation of the Wang et al. formula (valid positions, gaussian win)."""
    from dexnerf_tpu.core.metrics import ssim

    rng = np.random.RandomState(1)
    a = rng.rand(20, 20, 1).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(20, 20, 1), 0, 1).astype(np.float32)

    win, sigma = 11, 1.5
    x = np.arange(win) - win // 2
    g1 = np.exp(-0.5 * (x / sigma) ** 2)
    g1 /= g1.sum()
    w2 = np.outer(g1, g1)  # [11, 11] separable gaussian
    c1, c2 = 0.01**2, 0.03**2
    vals = []
    for i in range(20 - win + 1):
        for j in range(20 - win + 1):
            pa = a[i : i + win, j : j + win, 0]
            pb = b[i : i + win, j : j + win, 0]
            mu_a = (w2 * pa).sum()
            mu_b = (w2 * pb).sum()
            va = (w2 * pa * pa).sum() - mu_a**2
            vb = (w2 * pb * pb).sum() - mu_b**2
            cov = (w2 * pa * pb).sum() - mu_a * mu_b
            vals.append(
                ((2 * mu_a * mu_b + c1) * (2 * cov + c2))
                / ((mu_a**2 + mu_b**2 + c1) * (va + vb + c2))
            )
    expect = float(np.mean(vals))
    got = float(ssim(a, b))
    assert got == pytest.approx(expect, abs=1e-5), (got, expect)


def test_ssim_small_image_no_nan():
    """Images smaller than the 11px window: the window clamps to the image
    instead of producing a zero-size VALID conv (silent NaN)."""
    from dexnerf_tpu.core.metrics import ssim

    rng = np.random.RandomState(2)
    img = rng.rand(8, 8, 3).astype(np.float32)
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-6)
    s = float(ssim(img, np.clip(img + 0.2 * rng.randn(8, 8, 3), 0, 1)))
    assert np.isfinite(s) and s < 1.0
