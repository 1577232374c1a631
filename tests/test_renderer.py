"""Renderer: shapes, determinism, hierarchy, full-image blocking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexnerf_tpu.core.encoding import encoding_dim
from dexnerf_tpu.models import FlexibleNeRFModel
from dexnerf_tpu.render import (
    RayBatch,
    RenderSettings,
    make_ray_batch,
    render_image,
    render_rays,
)

S = RenderSettings(
    num_coarse=8,
    num_fine=8,
    perturb=True,
    radiance_field_noise_std=0.1,
    m_thres_cand=(5.0, 10.0, 20.0),
    num_encoding_fn_xyz=2,
    num_encoding_fn_dir=1,
)


def _setup(n_rays=16):
    model = FlexibleNeRFModel(
        num_layers=2,
        hidden_size=16,
        num_encoding_fn_xyz=S.num_encoding_fn_xyz,
        num_encoding_fn_dir=S.num_encoding_fn_dir,
    )
    in_dim = encoding_dim(3, S.num_encoding_fn_xyz) + encoding_dim(
        3, S.num_encoding_fn_dir
    )
    key = jax.random.PRNGKey(0)
    params = {
        "coarse": model.init(key, jnp.ones((1, in_dim))),
        "fine": model.init(jax.random.fold_in(key, 1), jnp.ones((1, in_dim))),
    }
    rd = jax.random.normal(jax.random.PRNGKey(2), (n_rays, 3))
    rays = RayBatch(
        origins=jnp.zeros((n_rays, 3)),
        directions=rd,
        viewdirs=rd / jnp.linalg.norm(rd, axis=-1, keepdims=True),
        near=jnp.full((n_rays,), 2.0),
        far=jnp.full((n_rays,), 6.0),
    )
    return model.apply, params, rays


def test_render_rays_shapes():
    apply_fn, params, rays = _setup()
    out = render_rays(apply_fn, apply_fn, params, rays, jax.random.PRNGKey(3), S)
    n = rays.origins.shape[0]
    assert out.coarse.rgb.shape == (n, 3)
    assert out.coarse.weights.shape == (n, S.num_coarse)
    assert out.fine.rgb.shape == (n, 3)
    assert out.fine.weights.shape == (n, S.num_coarse + S.num_fine)
    assert out.fine.depth.shape == (n,)
    assert out.fine.depth_dex.shape == (3, n)
    assert out.coarse.depth_dex is None
    # depth within [near, far] up to the 1e10 tail
    d = np.asarray(out.fine.depth)
    assert np.all(d >= 0)


def test_render_rays_deterministic_mode():
    apply_fn, params, rays = _setup()
    s_det = S.eval_variant()
    out1 = render_rays(apply_fn, apply_fn, params, rays, None, s_det)
    out2 = render_rays(apply_fn, apply_fn, params, rays, None, s_det)
    np.testing.assert_array_equal(
        np.asarray(out1.fine.rgb), np.asarray(out2.fine.rgb)
    )


def test_render_rays_key_changes_output():
    apply_fn, params, rays = _setup()
    out1 = render_rays(apply_fn, apply_fn, params, rays, jax.random.PRNGKey(0), S)
    out2 = render_rays(apply_fn, apply_fn, params, rays, jax.random.PRNGKey(1), S)
    assert not np.allclose(np.asarray(out1.fine.rgb), np.asarray(out2.fine.rgb))


def test_render_rays_coarse_only():
    apply_fn, params, rays = _setup()
    out = render_rays(apply_fn, None, params, rays, jax.random.PRNGKey(0), S)
    assert out.fine is None
    assert out.coarse.rgb.shape == (rays.origins.shape[0], 3)


def test_make_ray_batch_viewdirs_pre_ndc():
    ro = jnp.zeros((2, 2, 3)).at[..., 2].set(-1.0)
    rd = jnp.stack(
        [jnp.full((2, 2), 0.2), jnp.full((2, 2), -0.1), jnp.full((2, 2), -1.0)],
        axis=-1,
    )
    rays = make_ray_batch(
        ro, rd, 0.0, 1.0, use_ndc=True, height=2, width=2, focal_length=5.0
    )
    assert rays.origins.shape == (4, 3)
    # viewdirs are normalized raw directions, not NDC directions
    expected = np.asarray(rd.reshape(-1, 3))
    expected = expected / np.linalg.norm(expected, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(rays.viewdirs), expected, rtol=1e-5)
    # NDC rays differ from raw rays
    assert not np.allclose(np.asarray(rays.directions), np.asarray(rd.reshape(-1, 3)))


def test_render_image_matches_render_rays():
    # Full-image rendering with padding (H*W not a multiple of block) must
    # equal a direct render of the same rays.
    apply_fn, params, _ = _setup()
    H, W = 3, 5
    rd = jax.random.normal(jax.random.PRNGKey(5), (H, W, 3))
    ro = jnp.ones((H, W, 3))
    s_det = S.eval_variant()

    out_img = render_image(
        apply_fn, apply_fn, params, ro, rd, 2.0, 6.0, s_det, block_size=4
    )
    assert out_img.fine.rgb.shape == (H, W, 3)
    assert out_img.fine.depth_dex.shape == (3, H, W)

    rays = make_ray_batch(ro, rd, 2.0, 6.0)
    out_flat = render_rays(apply_fn, apply_fn, params, rays, None, s_det)
    np.testing.assert_allclose(
        np.asarray(out_img.fine.rgb).reshape(-1, 3),
        np.asarray(out_flat.fine.rgb),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_img.fine.depth_dex).reshape(3, -1),
        np.asarray(out_flat.fine.depth_dex),
        atol=1e-5,
    )


def test_render_rays_jit_and_grad():
    apply_fn, params, rays = _setup(n_rays=8)

    @jax.jit
    def loss_fn(params, key):
        out = render_rays(apply_fn, apply_fn, params, rays, key, S)
        return jnp.mean(out.fine.rgb ** 2) + jnp.mean(out.coarse.rgb ** 2)

    g = jax.grad(loss_fn)(params, jax.random.PRNGKey(0))
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # some gradient must flow to both models
    assert any(np.abs(np.asarray(l)).max() > 0 for l in jax.tree.leaves(g["coarse"]))
    assert any(np.abs(np.asarray(l)).max() > 0 for l in jax.tree.leaves(g["fine"]))
