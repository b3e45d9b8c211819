"""SO(3)/SE(3) exponential maps and pose updates.

Semantics match the reference's left-multiplicative pose parameterisation
(reference utils/pose_utils.py:22-87): the tracked pose is a world-to-camera
rigid transform T_w2c = [R | t]; each optimiser step learns a 6-dof twist
tau = (rho, theta) and applies T_w2c <- exp(tau) @ T_w2c, then zeroes tau.

Everything here is pure JAX, branch-free (jnp.where instead of data-dependent
Python branches) so it can live inside jitted tracking/mapping loops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-5


def hat(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of a 3-vector (so(3) hat operator)."""
    x, y, z = v[0], v[1], v[2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y]),
            jnp.stack([z, zero, -x]),
            jnp.stack([-y, x, zero]),
        ]
    )


def so3_exp(theta: jax.Array) -> jax.Array:
    """Rodrigues formula with a 2nd-order Taylor fallback near zero.

    Matches reference utils/pose_utils.py:22-37 (angle < 1e-5 branch).
    Branch-free and NaN-safe under autodiff: the angle only enters through a
    guarded square (the "double-where" trick), and the small-angle branch is
    a Taylor polynomial in theta^2 — so gradients at theta = 0 are exact.
    """
    W = hat(theta)
    W2 = W @ W
    sq = jnp.sum(theta * theta)
    eye = jnp.eye(3, dtype=theta.dtype)

    small = sq < _EPS * _EPS
    sq_safe = jnp.where(small, 1.0, sq)
    a = jnp.sqrt(sq_safe)
    sin_term = jnp.where(small, 1.0 - sq / 6.0, jnp.sin(a) / a)
    cos_term = jnp.where(small, 0.5 - sq / 24.0, (1.0 - jnp.cos(a)) / sq_safe)
    return eye + sin_term * W + cos_term * W2


def so3_left_jacobian(theta: jax.Array) -> jax.Array:
    """V(theta) such that t = V @ rho (reference utils/pose_utils.py:39-54)."""
    W = hat(theta)
    W2 = W @ W
    sq = jnp.sum(theta * theta)
    eye = jnp.eye(3, dtype=theta.dtype)

    small = sq < _EPS * _EPS
    sq_safe = jnp.where(small, 1.0, sq)
    a = jnp.sqrt(sq_safe)
    c1 = jnp.where(small, 0.5 - sq / 24.0, (1.0 - jnp.cos(a)) / sq_safe)
    c2 = jnp.where(small, 1.0 / 6.0 - sq / 120.0, (a - jnp.sin(a)) / (sq_safe * a))
    return eye + c1 * W + c2 * W2


def se3_exp(tau: jax.Array) -> jax.Array:
    """SE(3) exponential of tau = (rho[3], theta[3]) -> 4x4 homogeneous matrix.

    Matches reference utils/pose_utils.py:56-68 (rho first, theta second).
    """
    rho = tau[:3]
    theta = tau[3:]
    R = so3_exp(theta)
    t = so3_left_jacobian(theta) @ rho
    T = jnp.eye(4, dtype=tau.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


def so3_log(R: jax.Array) -> jax.Array:
    """Log map of a rotation matrix -> axis-angle 3-vector."""
    cos_angle = jnp.clip((jnp.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    angle = jnp.arccos(cos_angle)
    w = jnp.stack([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    small = angle < _EPS
    a = jnp.where(small, 1.0, angle)
    scale = jnp.where(small, 0.5, a / (2.0 * jnp.sin(a)))
    return scale * w


def apply_delta(R: jax.Array, t: jax.Array, tau: jax.Array):
    """Left-multiplicative pose update: [R'|t'] = exp(tau) @ [R|t].

    This is the single source of pose gradients: the rasterizer consumes
    (R', t') = apply_delta(R_const, t_const, tau) with tau a learned
    parameter, so autodiff through the renderer yields d(loss)/d(tau) —
    the TPU-native equivalent of the reference CUDA rasterizer's
    camera-pose backward (reference utils/pose_utils.py:70-87).
    """
    dT = se3_exp(tau)
    R_new = dT[:3, :3] @ R
    t_new = dT[:3, :3] @ t + dT[:3, 3]
    return R_new, t_new


def rt_to_mat(R: jax.Array, t: jax.Array) -> jax.Array:
    """4x4 homogeneous matrix from rotation and translation."""
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


def invert_rt(R: jax.Array, t: jax.Array):
    """Inverse of a rigid transform given as (R, t)."""
    R_inv = R.T
    return R_inv, -(R_inv @ t)


def relative_translation_norm(R_a, t_a, R_b, t_b) -> jax.Array:
    """|| translation of (T_a @ T_b^-1) || — keyframe distance metric.

    Mirrors `dist = norm((pose_CW @ last_kf_WC)[0:3, 3])` in the reference
    keyframe policy (utils/slam_frontend.py:1589-1592).
    """
    Rb_inv, tb_inv = invert_rt(R_b, t_b)
    t_rel = R_a @ tb_inv + t_a
    return jnp.linalg.norm(t_rel)
