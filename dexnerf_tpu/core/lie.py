"""SO(3)/SE(3) Lie-group operations (pose optimization support).

JAX re-design of the reference's ``lieutils.py`` (PointNetLK-derived, dead
code there — kept "for future pose optimization", SURVEY.md §1). The
reference hand-writes analytic gradients as ``torch.autograd.Function``s;
in JAX the same exp/log maps are differentiable for free, with Taylor
fallbacks near the identity to keep gradients finite.

API: ``hat``/``vee`` (both groups), ``so3_exp``/``so3_log``,
``se3_exp``/``se3_log``, ``so3_inverse``/``se3_inverse``,
``se3_transform``. All batched over leading axes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-8

# TPU matmul default precision is bf16 (CLAUDE.md); these are tiny 3x3/4x4
# contractions on POSE data — camera translations ~4.0 would see ~1e-2
# absolute error under bf16 truncation, the same order as the corrections
# pose optimization recovers. HIGHEST costs nothing at this size.
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def so3_hat(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], -1),
            jnp.stack([wz, zeros, -wx], -1),
            jnp.stack([-wy, wx, zeros], -1),
        ],
        -2,
    )


def so3_vee(W: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] skew -> [..., 3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], -1)


def _exp_coeffs(theta2):
    """(sin t / t, (1-cos t)/t^2) from t^2, gradient-safe at t=0.

    The "double-where" pattern: the sqrt only ever sees values bounded away
    from zero, so the Taylor branch (polynomial in t^2) carries both the
    value and the gradient near the identity.
    """
    small = theta2 < 1e-8
    safe_t2 = jnp.where(small, 1.0, theta2)
    t = jnp.sqrt(safe_t2)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(t) / t)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(t)) / safe_t2)
    return a, b


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: axis-angle [..., 3] -> rotation [..., 3, 3]."""
    theta2 = jnp.sum(w * w, axis=-1)
    W = so3_hat(w)
    W2 = _mm(W, W)
    a, b = _exp_coeffs(theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation [..., 3, 3] -> axis-angle [..., 3] (|w| in [0, pi])."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0 + _EPS, 1.0 - _EPS)
    theta = jnp.arccos(cos_theta)
    W = (R - jnp.swapaxes(R, -1, -2)) / 2.0
    w = so3_vee(W)
    scale = theta / jnp.maximum(jnp.sin(theta), _EPS)
    small = theta[..., None] < 1e-4
    return jnp.where(small, w, scale[..., None] * w)


def so3_inverse(R: jnp.ndarray) -> jnp.ndarray:
    return jnp.swapaxes(R, -1, -2)


def se3_hat(xi: jnp.ndarray) -> jnp.ndarray:
    """Twist [..., 6] (w, v) -> [..., 4, 4]."""
    w, v = xi[..., :3], xi[..., 3:]
    W = so3_hat(w)
    top = jnp.concatenate([W, v[..., :, None]], axis=-1)
    bottom = jnp.zeros((*xi.shape[:-1], 1, 4), dtype=xi.dtype)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_vee(X: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([so3_vee(X[..., :3, :3]), X[..., :3, 3]], axis=-1)


def _so3_V(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian V with V v = translation of exp of the twist."""
    theta2 = jnp.sum(w * w, axis=-1)
    W = so3_hat(w)
    W2 = _mm(W, W)
    small = theta2 < 1e-8
    safe_t2 = jnp.where(small, 1.0, theta2)
    t = jnp.sqrt(safe_t2)
    _, b = _exp_coeffs(theta2)  # (1-cos)/t^2
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (t - jnp.sin(t)) / (safe_t2 * t),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Twist [..., 6] (w, v) -> rigid transform [..., 4, 4]."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t = _mm(_so3_V(w), v[..., :, None])[..., 0]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.concatenate(
        [
            jnp.zeros((*xi.shape[:-1], 1, 3), dtype=xi.dtype),
            jnp.ones((*xi.shape[:-1], 1, 1), dtype=xi.dtype),
        ],
        axis=-1,
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """Rigid transform [..., 4, 4] -> twist [..., 6]."""
    w = so3_log(T[..., :3, :3])
    V = _so3_V(w)
    v = jnp.linalg.solve(V, T[..., :3, 3][..., :, None])[..., 0]
    return jnp.concatenate([w, v], axis=-1)


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R_T = jnp.swapaxes(T[..., :3, :3], -1, -2)
    t = T[..., :3, 3]
    t_inv = -_mm(R_T, t[..., :, None])[..., 0]
    top = jnp.concatenate([R_T, t_inv[..., :, None]], axis=-1)
    bottom = T[..., 3:, :]
    return jnp.concatenate([top, bottom], axis=-2)


def se3_transform(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply [..., 4, 4] to points [..., N, 3]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return _mm(pts, jnp.swapaxes(R, -1, -2)) + t[..., None, :]
