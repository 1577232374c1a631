"""Pallas kernels: parity vs the XLA reference implementations.

On the CPU test backend the kernels run in interpreter mode
(``interpret=True``); the same code compiles via Mosaic on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexnerf_tpu.core.encoding import encoding_dim
from dexnerf_tpu.core.sampling import sample_pdf, weights_to_cdf
from dexnerf_tpu.models import FlexibleNeRFModel
from dexnerf_tpu.ops import (
    make_fused_flexible_field,
    sample_pdf_branchless,
    sample_pdf_pallas,
)
from dexnerf_tpu.ops.sample_pdf_pallas import _sample_pdf_branchless_xla
from dexnerf_tpu.render import RenderSettings, encode_points


def _random_pdf_inputs(B=8, M=62, N=64, seed=0):
    rng = np.random.RandomState(seed)
    bins = np.sort(rng.rand(B, M + 1) * 4 + 2, axis=-1).astype(np.float32)
    weights = rng.rand(B, M).astype(np.float32)
    u = rng.rand(B, N).astype(np.float32)
    return jnp.asarray(bins), jnp.asarray(weights), jnp.asarray(u)


def _reference_interp(bins, weights, u):
    """Reference semantics (take_along_axis path) with external uniforms."""
    cdf = weights_to_cdf(weights)
    from dexnerf_tpu.core.sampling import searchsorted_right

    inds = searchsorted_right(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)
    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g0 = jnp.take_along_axis(bins, below, axis=-1)
    bins_g1 = jnp.take_along_axis(bins, above, axis=-1)
    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def test_branchless_xla_matches_reference():
    bins, weights, u = _random_pdf_inputs()
    ref = _reference_interp(bins, weights, u)
    got = _sample_pdf_branchless_xla(bins, weights, u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_branchless_xla_endpoint_u():
    # u = 0 and u = 1 exactly (deterministic linspace endpoints)
    bins, weights, _ = _random_pdf_inputs(B=4, M=14, N=5)
    u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 5), (4, 5)).astype(jnp.float32)
    ref = _reference_interp(bins, weights, u)
    got = _sample_pdf_branchless_xla(bins, weights, u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_sample_pdf_pallas_interpret_matches_reference():
    bins, weights, u = _random_pdf_inputs(B=16)
    ref = _reference_interp(bins, weights, u)
    got = sample_pdf_pallas(bins, weights, u, block_rays=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_sample_pdf_matches_v1_gather_semantics():
    """The reference ships TWO sample_pdf variants; the original
    (``nerf_helpers.py:224-259``) differs from ``sample_pdf_2`` only in
    spelling (``gather_cdf_util`` + ``zeros_like(inds)`` clamp operand).
    Pin our single implementation against a from-scratch numpy build of
    the v1 construction so the claimed equivalence stays checked."""
    from dexnerf_tpu.core.sampling import sample_pdf_v1

    bins, weights, _ = _random_pdf_inputs(B=8, M=30, N=16, seed=3)
    got = np.asarray(sample_pdf_v1(bins, weights, 16, det=True))

    # v1 semantics, gather-based, in numpy
    w = np.asarray(weights) + 1e-5
    pdf = w / w.sum(-1, keepdims=True)
    cdf = np.concatenate(
        [np.zeros_like(pdf[..., :1]), np.cumsum(pdf, axis=-1)], axis=-1
    )
    u = np.broadcast_to(
        np.linspace(0.0, 1.0, 16, dtype=np.float32), (8, 16)
    )
    inds = np.stack(
        [np.searchsorted(cdf[b], u[b], side="right") for b in range(8)]
    )
    below = np.maximum(np.zeros_like(inds), inds - 1)
    above = np.minimum(cdf.shape[-1] - 1, inds)
    bn = np.asarray(bins)
    cdf_g0 = np.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = np.take_along_axis(cdf, above, axis=-1)
    bins_g0 = np.take_along_axis(bn, below, axis=-1)
    bins_g1 = np.take_along_axis(bn, above, axis=-1)
    denom = cdf_g1 - cdf_g0
    denom = np.where(denom < 1e-5, np.ones_like(denom), denom)
    ref = bins_g0 + (u - cdf_g0) / denom * (bins_g1 - bins_g0)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_sample_pdf_branchless_det_matches_core():
    bins, weights, _ = _random_pdf_inputs(B=8, M=30, N=16)
    core = sample_pdf(bins, weights, 16, det=True)
    got = sample_pdf_branchless(
        bins, weights, 16, det=True, use_pallas=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(core), atol=1e-4)


def test_fused_mlp_matches_flax():
    model = FlexibleNeRFModel(
        num_layers=4,
        hidden_size=32,
        skip_connect_every=2,  # exercises the skip concat
        num_encoding_fn_xyz=4,
        num_encoding_fn_dir=2,
    )
    in_dim = encoding_dim(3, 4) + encoding_dim(3, 2)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.ones((1, in_dim)))

    N, S = 6, 8
    pts = jax.random.normal(jax.random.PRNGKey(1), (N, S, 3))
    viewdirs = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
    viewdirs = viewdirs / jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)

    settings = RenderSettings(
        num_encoding_fn_xyz=4, num_encoding_fn_dir=2
    )
    enc = encode_points(pts, viewdirs, settings)
    ref = model.apply(params, enc)

    field = make_fused_flexible_field(model, block_samples=16, interpret=True)
    got = field(params, pts, viewdirs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_fused_mlp_no_viewdirs():
    model = FlexibleNeRFModel(
        num_layers=3,
        hidden_size=16,
        num_encoding_fn_xyz=2,
        use_viewdirs=False,
    )
    in_dim = encoding_dim(3, 2)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, in_dim)))
    pts = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 3))
    settings = RenderSettings(num_encoding_fn_xyz=2, use_viewdirs=False)
    ref = model.apply(params, encode_points(pts, None, settings))
    field = make_fused_flexible_field(model, block_samples=16, interpret=True)
    got = field(params, pts, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_fused_mlp_in_renderer():
    """Fused field plugs into render_rays and matches the XLA path."""
    from dexnerf_tpu.render import RayBatch, render_rays

    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=16, num_encoding_fn_xyz=2,
        num_encoding_fn_dir=1,
    )
    in_dim = encoding_dim(3, 2) + encoding_dim(3, 1)
    key = jax.random.PRNGKey(0)
    params = {
        "coarse": model.init(key, jnp.ones((1, in_dim))),
        "fine": model.init(jax.random.fold_in(key, 1), jnp.ones((1, in_dim))),
    }
    s = RenderSettings(
        num_coarse=4, num_fine=4, perturb=False,
        num_encoding_fn_xyz=2, num_encoding_fn_dir=1,
    )
    n = 8
    rd = jax.random.normal(jax.random.PRNGKey(3), (n, 3))
    rays = RayBatch(
        origins=jnp.zeros((n, 3)),
        directions=rd,
        viewdirs=rd / jnp.linalg.norm(rd, axis=-1, keepdims=True),
        near=jnp.full((n,), 2.0),
        far=jnp.full((n,), 6.0),
    )
    ref = render_rays(model.apply, model.apply, params, rays, None, s)
    field = make_fused_flexible_field(model, block_samples=32, interpret=True)
    got = render_rays(
        model.apply, model.apply, params, rays, None, s,
        coarse_field=field, fine_field=field,
    )
    np.testing.assert_allclose(
        np.asarray(got.fine.rgb), np.asarray(ref.fine.rgb), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.fine.depth), np.asarray(ref.fine.depth), atol=1e-4
    )


def test_fused_train_field_grad_parity():
    """Custom-VJP fused field: weight grads match autodiff through the XLA
    field (interpret mode)."""
    from dexnerf_tpu.ops.fused_mlp_train import make_fused_flexible_field_train

    model = FlexibleNeRFModel(
        num_layers=4,
        hidden_size=16,
        skip_connect_every=2,  # exercises skip in fwd AND bwd
        num_encoding_fn_xyz=3,
        num_encoding_fn_dir=2,
    )
    in_dim = encoding_dim(3, 3) + encoding_dim(3, 2)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, in_dim)))
    N, S = 4, 6
    pts = jax.random.normal(jax.random.PRNGKey(1), (N, S, 3))
    vd = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    tgt = jax.random.normal(jax.random.PRNGKey(3), (N, S, 4))

    settings = RenderSettings(num_encoding_fn_xyz=3, num_encoding_fn_dir=2)

    def loss_xla(p):
        raw = model.apply(p, encode_points(pts, vd, settings))
        return jnp.mean((raw - tgt) ** 2)

    field = make_fused_flexible_field_train(
        model, block_samples=8, compute_dtype=jnp.float32, interpret=True
    )

    def loss_fused(p):
        raw = field(p, pts, vd)
        return jnp.mean((raw - tgt) ** 2)

    v1, g1 = jax.value_and_grad(loss_xla)(params)
    v2, g2 = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = {jax.tree_util.keystr(p): l for p, l in
             jax.tree_util.tree_leaves_with_path(g2)}
    assert len(flat1) == len(flat2)
    for path, leaf in flat1:
        k = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(flat2[k]), np.asarray(leaf), atol=5e-5,
            err_msg=f"grad mismatch at {k}",
        )


def test_fused_train_field_multiblock_accumulation():
    """Grid accumulation across blocks: grads identical for 1 vs 4 blocks."""
    from dexnerf_tpu.ops.fused_mlp_train import make_fused_flexible_field_train

    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=8, num_encoding_fn_xyz=2,
        num_encoding_fn_dir=1,
    )
    in_dim = encoding_dim(3, 2) + encoding_dim(3, 1)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, in_dim)))
    N, S = 8, 4  # 32 samples
    pts = jax.random.normal(jax.random.PRNGKey(1), (N, S, 3))
    vd = jax.random.normal(jax.random.PRNGKey(2), (N, 3))

    def grad_with_block(block):
        field = make_fused_flexible_field_train(
            model, block_samples=block, compute_dtype=jnp.float32,
            interpret=True,
        )
        return jax.grad(lambda p: jnp.sum(field(p, pts, vd) ** 2))(params)

    g1 = grad_with_block(32)
    g4 = grad_with_block(8)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_render_matches_xla():
    """PE->MLP->compositing kernel (interpret) == XLA render_rays, incl.
    weights, depth, disparity, acc, white background, and the Dex
    σ-threshold depths with the no-hit argmax-0 fallback."""
    from dexnerf_tpu.core.encoding import encoding_dim
    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.ops import make_fused_render_rays
    from dexnerf_tpu.render import RayBatch, RenderSettings, render_rays

    enc_xyz, enc_dir = 3, 2
    settings = RenderSettings(
        num_coarse=8, num_fine=8, perturb=False,
        radiance_field_noise_std=0.0, white_background=True,
        m_thres_cand=(5.0, 10.0),
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    model = FlexibleNeRFModel(
        num_layers=3, hidden_size=32, skip_connect_every=4,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    in_dim = encoding_dim(3, enc_xyz) + encoding_dim(3, enc_dir)
    key = jax.random.PRNGKey(0)
    params = {
        "coarse": model.init(key, jnp.ones((1, in_dim))),
        "fine": model.init(jax.random.fold_in(key, 1), jnp.ones((1, in_dim))),
    }
    n = 20
    rd = jax.random.normal(jax.random.fold_in(key, 2), (n, 3))
    rays = RayBatch(
        origins=jnp.zeros((n, 3)),
        directions=rd,
        viewdirs=rd / jnp.linalg.norm(rd, axis=-1, keepdims=True),
        near=jnp.full((n,), 2.0),
        far=jnp.full((n,), 6.0),
    )
    impl = make_fused_render_rays(
        model, model, settings, block_samples=64, interpret=True
    )
    got = impl(params, rays, None)
    want = render_rays(
        model.apply, model.apply, params, rays, None, settings
    )
    for g, w in [
        (got.coarse.rgb, want.coarse.rgb),
        (got.coarse.weights, want.coarse.weights),
        (got.coarse.depth, want.coarse.depth),
        (got.fine.rgb, want.fine.rgb),
        (got.fine.depth, want.fine.depth),
        (got.fine.accumulation, want.fine.accumulation),
        (got.fine.disparity, want.fine.disparity),
        (got.fine.depth_dex, want.fine.depth_dex),
    ]:
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-5
        )


def test_fused_render_in_render_image():
    """rays_impl plugs into render_image (padding + reshape path)."""
    from dexnerf_tpu.core.encoding import encoding_dim
    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.ops import make_fused_render_rays
    from dexnerf_tpu.render import RenderSettings, render_image

    enc_xyz, enc_dir = 2, 1
    settings = RenderSettings(
        num_coarse=4, num_fine=4, perturb=False,
        radiance_field_noise_std=0.0,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=16,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    in_dim = encoding_dim(3, enc_xyz) + encoding_dim(3, enc_dir)
    key = jax.random.PRNGKey(3)
    params = {
        "coarse": model.init(key, jnp.ones((1, in_dim))),
        "fine": model.init(jax.random.fold_in(key, 1), jnp.ones((1, in_dim))),
    }
    H, W = 5, 7
    ro = jnp.zeros((H, W, 3))
    rd = jax.random.normal(jax.random.fold_in(key, 2), (H, W, 3))
    impl = make_fused_render_rays(
        model, model, settings, block_samples=32, interpret=True
    )
    out_fused = render_image(
        model.apply, model.apply, params, ro, rd, 2.0, 6.0, settings,
        block_size=16, rays_impl=impl,
    )
    out_xla = render_image(
        model.apply, model.apply, params, ro, rd, 2.0, 6.0, settings,
        block_size=16,
    )
    assert out_fused.fine.rgb.shape == (H, W, 3)
    np.testing.assert_allclose(
        np.asarray(out_fused.fine.rgb), np.asarray(out_xla.fine.rgb),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_fused.fine.depth), np.asarray(out_xla.fine.depth),
        rtol=2e-4, atol=2e-5,
    )


def test_fused_render_interleaved_parts_matches_xla():
    """Large rays-per-block engages the ray-part interleave in the render
    kernel (independent MXU chains); outputs must match XLA exactly like
    the parts=1 case."""
    from dexnerf_tpu.core.encoding import encoding_dim
    from dexnerf_tpu.models import FlexibleNeRFModel
    from dexnerf_tpu.ops import make_fused_render_rays
    from dexnerf_tpu.render import RayBatch, RenderSettings, render_rays

    enc_xyz, enc_dir = 3, 2
    settings = RenderSettings(
        num_coarse=8, num_fine=8, perturb=False,
        radiance_field_noise_std=0.0, white_background=False,
        m_thres_cand=(5.0,),
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    model = FlexibleNeRFModel(
        num_layers=3, hidden_size=32, skip_connect_every=4,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    in_dim = encoding_dim(3, enc_xyz) + encoding_dim(3, enc_dir)
    key = jax.random.PRNGKey(1)
    params = {
        "coarse": model.init(key, jnp.ones((1, in_dim))),
        "fine": model.init(jax.random.fold_in(key, 1), jnp.ones((1, in_dim))),
    }
    n = 32
    rd = jax.random.normal(jax.random.fold_in(key, 2), (n, 3))
    rays = RayBatch(
        origins=jnp.zeros((n, 3)),
        directions=rd,
        viewdirs=rd / jnp.linalg.norm(rd, axis=-1, keepdims=True),
        near=jnp.full((n,), 2.0),
        far=jnp.full((n,), 6.0),
    )
    # fine pass: S = 16, rays_per_block = 512 // 16 = 32 -> parts = 4
    impl = make_fused_render_rays(
        model, model, settings, block_samples=512, interpret=True
    )
    got = impl(params, rays, None)
    # vs XLA, same tolerance as the parts=1 test (fine outputs are
    # inherently sample_pdf-bin-sensitive to coarse-weight rounding)
    want = render_rays(
        model.apply, model.apply, params, rays, None, settings
    )
    np.testing.assert_allclose(
        np.asarray(got.coarse.weights), np.asarray(want.coarse.weights),
        rtol=2e-4, atol=2e-5,
    )
    # the sharper property: the interleaved kernel reproduces the
    # parts=1 kernel EXACTLY (row partitioning changes no per-ray math)
    base = make_fused_render_rays(
        model, model, settings, block_samples=64, interpret=True
    )(params, rays, None)
    for g, w in [
        (got.fine.rgb, base.fine.rgb),
        (got.fine.weights, base.fine.weights),
        (got.fine.depth, base.fine.depth),
        (got.fine.disparity, base.fine.disparity),
        (got.fine.depth_dex, base.fine.depth_dex),
    ]:
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=0)


def test_fused_train_field_interleaved_parts():
    """rays_per_block >= 16 engages the ray-part interleave in the field
    fwd+bwd kernels; outputs and grads must equal the parts=1 kernels."""
    from dexnerf_tpu.ops.fused_mlp_train import make_fused_flexible_field_train

    model = FlexibleNeRFModel(
        num_layers=3, hidden_size=16, skip_connect_every=2,
        num_encoding_fn_xyz=2, num_encoding_fn_dir=1,
    )
    in_dim = encoding_dim(3, 2) + encoding_dim(3, 1)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, in_dim)))
    N, S = 32, 4
    pts = jax.random.normal(jax.random.PRNGKey(1), (N, S, 3))
    vd = jax.random.normal(jax.random.PRNGKey(2), (N, 3))

    def val_and_grad(block):
        # block 128 -> rays_per_block 32 -> parts 4; block 16 -> parts 1
        field = make_fused_flexible_field_train(
            model, block_samples=block, block_samples_bwd=block,
            compute_dtype=jnp.float32, interpret=True,
        )
        return jax.value_and_grad(
            lambda p: jnp.sum(field(p, pts, vd) ** 2)
        )(params)

    v1, g1 = val_and_grad(16)
    v4, g4 = val_and_grad(128)
    np.testing.assert_allclose(float(v4), float(v1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_resample_matches_xla():
    """ops.resample_pallas: the fused CDF + inverse-transform + stable
    merge-sort + dists kernel equals hierarchical_z_vals + ray_dists
    (same uniform draws) in interpret mode, including det mode,
    zero-weight rays, and ray counts that need padding."""
    from dexnerf_tpu.core.sampling import hierarchical_z_vals
    from dexnerf_tpu.core.volrend import ray_dists
    from dexnerf_tpu.ops.resample_pallas import make_fused_resample

    Sc, Sf, N = 16, 8, 21  # N not a multiple of block_rays
    rng = np.random.RandomState(0)
    z = np.sort(rng.uniform(2, 6, (N, Sc)).astype(np.float32), axis=1)
    w = np.abs(rng.randn(N, Sc)).astype(np.float32)
    w[3] = 0.0  # zero-mass ray (the +1e-5 guard path)
    w[5] = 0.0
    w[5, 2] = 100.0  # near-delta pdf (u beyond cdf tail -> none_above)
    dirs = rng.randn(N, 3).astype(np.float32)
    dn = jnp.linalg.norm(jnp.asarray(dirs), axis=-1, keepdims=True)
    rs = make_fused_resample(Sc, Sf, block_rays=16, interpret=True)

    key = jax.random.PRNGKey(5)
    u = jax.random.uniform(key, (N, Sf), dtype=jnp.float32)
    zm_ref, _ = hierarchical_z_vals(
        key, jnp.asarray(z), jnp.asarray(w), Sf, det=False
    )
    d_ref = ray_dists(zm_ref, jnp.asarray(dirs))
    zm, dd = rs(jnp.asarray(z), jnp.asarray(w), u, dn)
    np.testing.assert_allclose(np.asarray(zm), np.asarray(zm_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dd), np.asarray(d_ref), atol=1e-4)
    # merged depths must be sorted
    assert np.all(np.diff(np.asarray(zm), axis=1) >= 0)

    zm_ref2, _ = hierarchical_z_vals(
        None, jnp.asarray(z), jnp.asarray(w), Sf, det=True
    )
    u_det = jnp.broadcast_to(jnp.linspace(0.0, 1.0, Sf), (N, Sf))
    zm2, _ = rs(jnp.asarray(z), jnp.asarray(w), u_det, dn)
    # the near-delta ray (5) hits the u == 1.0 == cdf[-1] tie, where a
    # 1-ulp difference in cdf-tail rounding (dot-accumulation order vs
    # XLA's sequential cumsum) legitimately resolves to the adjacent bin;
    # all smooth rays must match tightly
    smooth = np.ones(N, bool)
    smooth[5] = False
    np.testing.assert_allclose(
        np.asarray(zm2)[smooth], np.asarray(zm_ref2)[smooth], atol=1e-5
    )
    z5, r5 = np.asarray(zm2)[5], np.asarray(zm_ref2)[5]
    assert np.all(np.diff(z5) >= 0)
    assert np.mean(np.abs(z5 - r5) < 1e-5) > 0.9


def test_fused_loss_pallas_resample_matches_xla_resample():
    """make_fused_train_loss(resample="pallas") equals resample="xla" in
    loss AND gradients (interpret mode) — the in-kernel hierarchical
    resampling consumes the same uniform draws as the XLA path."""
    from dexnerf_tpu.data import build_ray_store
    from dexnerf_tpu.data.pipeline import sample_ray_batch
    from dexnerf_tpu.ops import make_fused_train_loss

    enc_xyz, enc_dir = 2, 1
    settings = RenderSettings(
        num_coarse=16, num_fine=8, perturb=True,
        radiance_field_noise_std=0.1,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    model = FlexibleNeRFModel(
        num_layers=2, hidden_size=16, skip_connect_every=3,
        num_encoding_fn_xyz=enc_xyz, num_encoding_fn_dir=enc_dir,
    )
    in_dim = encoding_dim(3, enc_xyz) + encoding_dim(3, enc_dir)
    key = jax.random.PRNGKey(0)
    params = {
        "coarse": model.init(key, jnp.ones((1, in_dim))),
        "fine": model.init(jax.random.fold_in(key, 1), jnp.ones((1, in_dim))),
    }
    rng = np.random.RandomState(0)
    images = rng.rand(2, 16, 16, 3).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    poses[:, 2, 3] = 4.0
    store = build_ray_store(images, poses, [16, 16, 20.0], 2.0, 6.0)
    rays, target = sample_ray_batch(store, jax.random.PRNGKey(3), 32)
    kw = dict(block_samples=128, interpret=True)
    lf_x = make_fused_train_loss(model, model, settings, resample="xla", **kw)
    lf_p = make_fused_train_loss(
        model, model, settings, resample="pallas", **kw
    )
    k = jax.random.PRNGKey(7)
    (lx, _), gx = jax.value_and_grad(
        lambda p: lf_x(p, rays, target, k), has_aux=True
    )(params)
    (lp, _), gp = jax.value_and_grad(
        lambda p: lf_p(p, rays, target, k), has_aux=True
    )(params)
    np.testing.assert_allclose(float(lx), float(lp), atol=1e-6)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_ray_blocking_mosaic_sublane_rule():
    """Ray blocks must be multiples of 8 whenever the grid exceeds one
    block (Mosaic sublane constraint) — regression for the S=192 (64+128
    fine pass, e.g. the hotdog config) crash where 8192//192=42 rays/block
    failed TPU lowering."""
    from dexnerf_tpu.ops.fused_mlp import _ray_blocking

    for S in (64, 128, 192, 96, 65):
        for budget in (1024, 4096, 8192):
            for N in (7, 8, 160000):
                block, pad, rpb = _ray_blocking(budget, N, S)
                assert block == rpb * S
                assert (N * S + pad) % block == 0
                n_blocks = (N * S + pad) // block
                if n_blocks > 1:
                    assert rpb % 8 == 0, (S, budget, N, rpb)
                assert rpb >= 1
