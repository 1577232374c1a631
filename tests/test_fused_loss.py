"""Combined loss+gradients kernel (``ops/fused_train_loss``) parity tests.

The kernel computes PE → MLP → compositing → MSE AND all parameter gradients
in one Pallas program per pass; here it runs in interpret mode on CPU and is
checked against autodiff through the XLA path (``render_rays`` +
``nerf_loss``) with the SAME key-split structure, so losses, metrics, and
every gradient leaf must agree to f32 rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dexnerf_tpu.core.encoding import encoding_dim
from dexnerf_tpu.models import FlexibleNeRFModel
from dexnerf_tpu.ops import make_fused_train_loss
from dexnerf_tpu.render import RayBatch, RenderSettings, render_rays
from dexnerf_tpu.train.step import nerf_loss


def _setup(n=8, num_coarse=4, num_fine=4, **settings_kw):
    model = FlexibleNeRFModel(
        num_layers=4,
        hidden_size=16,
        skip_connect_every=2,  # exercises skip in fwd AND bwd
        num_encoding_fn_xyz=3,
        num_encoding_fn_dir=2,
    )
    in_dim = encoding_dim(3, 3) + encoding_dim(3, 2)
    key = jax.random.PRNGKey(0)
    params = {
        "coarse": model.init(key, jnp.ones((1, in_dim))),
        "fine": model.init(jax.random.fold_in(key, 1), jnp.ones((1, in_dim))),
    }
    s = RenderSettings(
        num_coarse=num_coarse,
        num_fine=num_fine,
        num_encoding_fn_xyz=3,
        num_encoding_fn_dir=2,
        **settings_kw,
    )
    rd = jax.random.normal(jax.random.PRNGKey(3), (n, 3))
    rays = RayBatch(
        origins=jnp.zeros((n, 3)),
        directions=rd,
        viewdirs=rd / jnp.linalg.norm(rd, axis=-1, keepdims=True),
        near=jnp.full((n,), 2.0),
        far=jnp.full((n,), 6.0),
    )
    target = jax.random.uniform(jax.random.PRNGKey(4), (n, 3))
    return model, params, s, rays, target


def _xla_loss_fn(model, s, supervision="rgb"):
    def loss_fn(params, rays, target, key):
        result = render_rays(
            model.apply, model.apply, params, rays, key, s
        )
        return nerf_loss(result, target, supervision=supervision)

    return loss_fn


def _assert_grads_close(g_fused, g_xla, atol):
    flat_ref = jax.tree_util.tree_leaves_with_path(g_xla)
    flat_got = {
        jax.tree_util.keystr(p): l
        for p, l in jax.tree_util.tree_leaves_with_path(g_fused)
    }
    assert len(flat_ref) == len(flat_got)
    for path, leaf in flat_ref:
        k = jax.tree_util.keystr(path)
        scale = max(1.0, float(jnp.max(jnp.abs(leaf))))
        np.testing.assert_allclose(
            np.asarray(flat_got[k]), np.asarray(leaf), atol=atol * scale,
            err_msg=f"grad mismatch at {k}",
        )


def _compare(model, params, s, rays, target, key, supervision="rgb",
             block_samples=8, atol=5e-5):
    fused = make_fused_train_loss(
        model, model, s, supervision=supervision,
        block_samples=block_samples, interpret=True,
    )
    xla = _xla_loss_fn(model, s, supervision=supervision)
    (v1, m1), g1 = jax.value_and_grad(xla, has_aux=True)(
        params, rays, target, key
    )
    (v2, m2), g2 = jax.value_and_grad(fused, has_aux=True)(
        params, rays, target, key
    )
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    for k in ("loss", "coarse_loss", "fine_loss"):
        np.testing.assert_allclose(
            float(m2[k]), float(m1[k]), rtol=1e-5, err_msg=k
        )
    _assert_grads_close(g2, g1, atol)


def test_fused_loss_deterministic():
    model, params, s, rays, target = _setup(perturb=False)
    _compare(model, params, s, rays, target, key=None)


def test_fused_loss_stochastic_noise():
    """perturb + σ-noise: the fused path mirrors render_rays' key splits and
    consumes pre-generated normals, so the draws are identical."""
    model, params, s, rays, target = _setup(
        perturb=True, radiance_field_noise_std=0.3
    )
    _compare(model, params, s, rays, target, key=jax.random.PRNGKey(7))


def test_fused_loss_white_background_luminance():
    model, params, s, rays, target = _setup(
        perturb=False, white_background=True
    )
    _compare(
        model, params, s, rays, target, key=None, supervision="luminance"
    )


def test_fused_loss_interleaved_parts():
    """rays_per_block >= 16 triggers the 2-way ray-part interleave
    (independent MXU chains); must match XLA exactly like parts=1."""
    model, params, s, rays, target = _setup(
        n=32, num_coarse=4, num_fine=4,
        perturb=True, radiance_field_noise_std=0.2,
    )
    # block_samples 128 -> rays_per_block = 32 -> parts = 2 (Rp = 16)
    _compare(model, params, s, rays, target, key=jax.random.PRNGKey(5),
             block_samples=128)


def test_fused_loss_interleaved_parts_white_luminance():
    """The packed-lane rgb chain at parts > 1 with the luminance and
    white-background branches BOTH active: the per-part lane-group
    selectors (group-of-4 contractions, per-part valid masks, packed
    head bias) must reproduce XLA exactly, like rgb at parts=1 does."""
    model, params, s, rays, target = _setup(
        n=32, num_coarse=4, num_fine=4,
        perturb=True, radiance_field_noise_std=0.2,
        white_background=True,
    )
    # block_samples 128 -> rays_per_block = 32 -> parts = 2 (Rp = 16)
    _compare(model, params, s, rays, target, key=jax.random.PRNGKey(9),
             block_samples=128, supervision="luminance")


def test_fused_loss_ray_padding():
    """N not a multiple of rays-per-block: padded rays must contribute zero
    loss and zero gradient (the valid-mask path)."""
    model, params, s, rays, target = _setup(n=5, perturb=False)
    _compare(model, params, s, rays, target, key=None, block_samples=8)


def test_fused_loss_in_train_step():
    """make_train_step(fused_loss=...) tracks the XLA step's loss trajectory
    step for step (same keys, same init, same optimizer)."""
    from dexnerf_tpu.data import build_ray_store
    from dexnerf_tpu.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    model, params, s, _, _ = _setup(perturb=True)
    images = np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    poses[:, 2, 3] = 4.0
    store = build_ray_store(images, poses, [8, 8, 10.0], 2.0, 6.0)

    tx = make_optimizer(5e-3)
    fused = make_fused_train_loss(
        model, model, s, block_samples=8, interpret=True
    )
    step_fused = make_train_step(
        model.apply, model.apply, tx, s, batch_size=16, fused_loss=fused
    )
    step_xla = make_train_step(model.apply, model.apply, tx, s, batch_size=16)

    # independent param copies: the train step donates its state buffers
    st_f = init_train_state(jax.tree.map(jnp.copy, params), tx)
    st_x = init_train_state(jax.tree.map(jnp.copy, params), tx)
    key = jax.random.PRNGKey(11)
    losses_f, losses_x = [], []
    for _ in range(3):
        key, sub = jax.random.split(key)
        st_f, mf = step_fused(st_f, store, sub)
        st_x, mx = step_xla(st_x, store, sub)
        losses_f.append(float(mf["loss"]))
        losses_x.append(float(mx["loss"]))
    np.testing.assert_allclose(losses_f, losses_x, rtol=1e-4)
    assert losses_f[-1] < losses_f[0]


def test_fused_loss_saturated_density_grads():
    """Gradient parity in the saturated-compositing regime (interior
    samples with alpha == 1): late in training densities sharpen, and the
    backward through the guarded cumprod must keep matching autodiff.
    Saturation is forced by biasing the alpha head strongly positive."""
    model, params, s, rays, target = _setup(perturb=False)

    def boost(tree):
        li = model.num_layers  # Dense_{li+1} is the alpha head
        t = jax.tree_util.tree_map(lambda x: x, tree)  # copy structure
        p = t["params"][f"Dense_{li + 1}"]
        p["bias"] = p["bias"] + 60.0
        return t

    params = {
        "coarse": boost(params["coarse"]),
        "fine": boost(params["fine"]),
    }
    # sanity: the boosted field really saturates interior samples
    from dexnerf_tpu.core.sampling import stratified_z_vals
    from dexnerf_tpu.core.volrend import ray_dists
    from dexnerf_tpu.render.renderer import encode_points

    z = stratified_z_vals(rays.near, rays.far, s.num_coarse)
    pts = (
        rays.origins[..., None, :]
        + rays.directions[..., None, :] * z[..., :, None]
    )
    raw = model.apply(
        params["coarse"], encode_points(pts, rays.viewdirs, s)
    )
    alpha = 1.0 - jnp.exp(
        -jax.nn.relu(raw[..., 3]) * ray_dists(z, rays.directions)
    )
    assert float(jnp.max(alpha[..., :-1])) == 1.0  # interior saturation

    _compare(model, params, s, rays, target, key=None, atol=2e-4)


def _xla_depth_loss_fn(model, s, weight, valid_max=None):
    from dexnerf_tpu.train.step import masked_depth_mse

    def loss_fn(params, rays, target, key, depth_gt):
        result = render_rays(model.apply, model.apply, params, rays, key, s)
        loss, metrics = nerf_loss(result, target)
        d_pred = (
            result.fine.depth if result.fine is not None
            else result.coarse.depth
        )
        d = masked_depth_mse(d_pred, depth_gt, valid_max)
        loss = loss + weight * d
        metrics["depth_loss"] = d
        metrics["loss"] = loss
        return loss, metrics

    return loss_fn


def _compare_depth(model, params, s, rays, target, key, *, weight=0.5,
                   valid_max=None, num_fine=None, atol=5e-5):
    n = target.shape[0]
    # GT depth with some invalid entries (0) and, with valid_max, some
    # beyond the mask limit
    depth_gt = jnp.asarray(
        np.r_[0.0, np.linspace(2.5, 5.5, n - 1)], jnp.float32
    )
    fused = make_fused_train_loss(
        model, model if (num_fine or s.num_fine) else None, s,
        block_samples=8, interpret=True,
        depth_loss_weight=weight, depth_valid_max=valid_max,
    )
    assert fused.supports_depth
    xla = _xla_depth_loss_fn(model, s, weight, valid_max)
    (v1, m1), g1 = jax.value_and_grad(xla, has_aux=True)(
        params, rays, target, key, depth_gt
    )
    (v2, m2), g2 = jax.value_and_grad(fused, has_aux=True)(
        params, rays, target, key, depth_gt
    )
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    for k in ("loss", "coarse_loss", "fine_loss", "depth_loss"):
        np.testing.assert_allclose(
            float(m2[k]), float(m1[k]), rtol=1e-5, atol=1e-7, err_msg=k
        )
    _assert_grads_close(g2, g1, atol)


def test_fused_loss_depth_supervision_fine():
    """Depth term on the fine pass: loss, metric split, and every gradient
    leaf match XLA autodiff of photometric + masked depth MSE."""
    model, params, s, rays, target = _setup(perturb=False)
    _compare_depth(model, params, s, rays, target, key=None)


def test_fused_loss_depth_supervision_valid_max_stochastic():
    model, params, s, rays, target = _setup(
        perturb=True, radiance_field_noise_std=0.2
    )
    _compare_depth(
        model, params, s, rays, target, key=jax.random.PRNGKey(5),
        valid_max=5.0, weight=0.25,
    )


def test_fused_loss_depth_supervision_coarse_only():
    """No fine model: the depth term rides the coarse pass."""
    model, params, s, rays, target = _setup(num_fine=0, perturb=False)
    params = {"coarse": params["coarse"]}

    from dexnerf_tpu.train.step import masked_depth_mse

    n = target.shape[0]
    depth_gt = jnp.asarray(np.linspace(2.5, 5.5, n), jnp.float32)

    def xla(params, rays, target, key, depth_gt):
        result = render_rays(model.apply, None, params, rays, key, s)
        loss, metrics = nerf_loss(result, target)
        d = masked_depth_mse(result.coarse.depth, depth_gt)
        loss = loss + 0.5 * d
        metrics["depth_loss"] = d
        metrics["loss"] = loss
        return loss, metrics

    fused = make_fused_train_loss(
        model, None, s, block_samples=8, interpret=True,
        depth_loss_weight=0.5,
    )
    (v1, m1), g1 = jax.value_and_grad(xla, has_aux=True)(
        params, rays, target, None, depth_gt
    )
    (v2, m2), g2 = jax.value_and_grad(fused, has_aux=True)(
        params, rays, target, None, depth_gt
    )
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    np.testing.assert_allclose(
        float(m2["depth_loss"]), float(m1["depth_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m2["coarse_loss"]), float(m1["coarse_loss"]), rtol=1e-5
    )
    _assert_grads_close(g2, g1, 5e-5)
