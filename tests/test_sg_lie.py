"""SG PBR shading + SO(3)/SE(3) Lie ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexnerf_tpu.core.lie import (
    se3_exp,
    se3_hat,
    se3_inverse,
    se3_log,
    se3_transform,
    se3_vee,
    so3_exp,
    so3_hat,
    so3_inverse,
    so3_log,
    so3_vee,
)
from dexnerf_tpu.models.sg import (
    SG,
    pack_sg,
    sg_evaluate,
    sg_inner_product,
    sg_integral,
    sg_shade,
    srgb_to_linear,
    unpack_sg,
)


# ------------------------------------------------------------------ SG

def _mixture(L=4, seed=0):
    rng = np.random.RandomState(seed)
    amp = rng.rand(1, L, 3).astype(np.float32)
    axis = rng.randn(1, L, 3).astype(np.float32)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    sharp = rng.uniform(1, 20, (1, L, 1)).astype(np.float32)
    return jnp.asarray(np.concatenate([amp, axis, sharp], -1))


def test_srgb_to_linear_endpoints():
    np.testing.assert_allclose(float(srgb_to_linear(jnp.array(0.0))), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(srgb_to_linear(jnp.array(1.0))), 1.0, atol=1e-5)
    # below the switch: linear segment
    np.testing.assert_allclose(
        float(srgb_to_linear(jnp.array(0.02))), 0.02 / 12.92, rtol=1e-5
    )


def test_sg_integral_matches_quadrature():
    sg = unpack_sg(_mixture(L=1))
    # Monte-Carlo estimate of the sphere integral
    rng = np.random.RandomState(1)
    d = rng.randn(200_000, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    vals = np.asarray(sg_evaluate(
        SG(sg.amplitude[0], sg.axis[0], sg.sharpness[0]), jnp.asarray(d)[:, None, :]
    ))
    mc = (vals.mean(0) * 4 * np.pi).reshape(-1)
    analytic = np.asarray(sg_integral(sg)).reshape(-1)
    np.testing.assert_allclose(mc, analytic, rtol=0.05)


def test_sg_inner_product_symmetry():
    a = unpack_sg(_mixture(seed=2))
    b = unpack_sg(_mixture(seed=3))
    ab = np.asarray(sg_inner_product(a, b))
    ba = np.asarray(sg_inner_product(b, a))
    np.testing.assert_allclose(ab, ba, rtol=1e-5)


def test_sg_shade_shapes_and_nonnegative():
    B, L = 6, 5
    rng = np.random.RandomState(0)
    illum = jnp.asarray(
        np.concatenate(
            [
                rng.rand(B, L, 3),
                rng.randn(B, L, 3),
                rng.uniform(1, 20, (B, L, 1)),
            ],
            -1,
        ).astype(np.float32)
    )
    basecolor = jnp.asarray(rng.rand(B, 3).astype(np.float32))
    metallic = jnp.asarray(rng.rand(B, 1).astype(np.float32))
    roughness = jnp.asarray(rng.uniform(0.1, 1, (B, 1)).astype(np.float32))
    normal = jnp.asarray(rng.randn(B, 3).astype(np.float32))
    view = jnp.asarray(rng.randn(B, 3).astype(np.float32))
    out = sg_shade(illum, basecolor, metallic, roughness, normal, view)
    assert out.shape == (B, 3)
    assert np.all(np.asarray(out) >= 0)
    # background compositing path
    alpha = jnp.asarray(rng.rand(B).astype(np.float32))
    out2 = sg_shade(
        illum, basecolor, metallic, roughness, normal, view, alpha,
        eval_background=True,
    )
    assert out2.shape == (B, 3)
    with pytest.raises(ValueError):
        sg_shade(illum, basecolor, metallic, roughness, normal, view,
                 eval_background=True)


def test_sg_shade_differentiable():
    B, L = 2, 3
    rng = np.random.RandomState(4)
    illum = jnp.asarray(rng.rand(B, L, 7).astype(np.float32) + 0.5)

    def loss(illum):
        out = sg_shade(
            illum,
            jnp.full((B, 3), 0.5),
            jnp.full((B, 1), 0.2),
            jnp.full((B, 1), 0.4),
            jnp.asarray(rng.randn(B, 3).astype(np.float32)),
            jnp.asarray(rng.randn(B, 3).astype(np.float32)),
        )
        return jnp.sum(out)

    g = jax.grad(loss)(illum)
    assert np.all(np.isfinite(np.asarray(g)))


# ------------------------------------------------------------------ Lie

def test_so3_hat_vee_roundtrip():
    w = jnp.asarray(np.random.RandomState(0).randn(5, 3).astype(np.float32))
    np.testing.assert_allclose(np.asarray(so3_vee(so3_hat(w))), np.asarray(w))


def test_so3_exp_is_rotation():
    w = jnp.asarray(np.random.RandomState(1).randn(8, 3).astype(np.float32))
    R = np.asarray(so3_exp(w))
    for r in R:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_so3_exp_log_roundtrip():
    rng = np.random.RandomState(2)
    w = rng.randn(6, 3).astype(np.float32)
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(
        0.1, 3.0, (6, 1)
    ).astype(np.float32)  # |w| < pi
    w2 = np.asarray(so3_log(so3_exp(jnp.asarray(w))))
    np.testing.assert_allclose(w2, w, atol=1e-3)


def test_so3_exp_small_angle():
    w = jnp.asarray([[1e-6, 0.0, 0.0]])
    R = np.asarray(so3_exp(w))[0]
    np.testing.assert_allclose(R, np.eye(3), atol=1e-5)
    g = jax.jacobian(lambda w: so3_exp(w).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_se3_exp_log_roundtrip():
    rng = np.random.RandomState(3)
    w = rng.randn(4, 3).astype(np.float32)
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(
        0.1, 2.5, (4, 1)
    ).astype(np.float32)
    v = rng.randn(4, 3).astype(np.float32)
    xi = jnp.asarray(np.concatenate([w, v], -1))
    T = se3_exp(xi)
    # bottom row exact
    np.testing.assert_allclose(np.asarray(T)[:, 3], [[0, 0, 0, 1]] * 4, atol=1e-6)
    xi2 = np.asarray(se3_log(T))
    np.testing.assert_allclose(xi2, np.asarray(xi), atol=1e-3)


def test_se3_inverse_and_transform():
    rng = np.random.RandomState(4)
    xi = jnp.asarray(rng.randn(6).astype(np.float32) * 0.5)
    T = se3_exp(xi)
    Tinv = se3_inverse(T)
    np.testing.assert_allclose(np.asarray(T @ Tinv), np.eye(4), atol=1e-5)
    pts = jnp.asarray(rng.randn(10, 3).astype(np.float32))
    back = se3_transform(Tinv, se3_transform(T, pts))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_se3_hat_vee_roundtrip():
    xi = jnp.asarray(np.random.RandomState(5).randn(3, 6).astype(np.float32))
    np.testing.assert_allclose(np.asarray(se3_vee(se3_hat(xi))), np.asarray(xi))
