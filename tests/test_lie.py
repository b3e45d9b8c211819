import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from lvdgs_tpu.core import lie


def test_so3_exp_matches_scipy():
    rng = np.random.default_rng(0)
    for _ in range(10):
        theta = rng.normal(size=3)
        R = np.asarray(lie.so3_exp(jnp.asarray(theta, jnp.float32)))
        R_ref = Rotation.from_rotvec(theta).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_exp_small_angle():
    theta = jnp.array([1e-7, -1e-7, 1e-7], jnp.float32)
    R = lie.so3_exp(theta)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
    # gradient is finite at zero
    g = jax.grad(lambda th: lie.so3_exp(th).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_se3_exp_roundtrip():
    rng = np.random.default_rng(1)
    tau = jnp.asarray(rng.normal(size=6) * 0.3, jnp.float32)
    T = lie.se3_exp(tau)
    T_inv = lie.se3_exp(-tau) if False else jnp.linalg.inv(T)
    np.testing.assert_allclose(np.asarray(T @ T_inv), np.eye(4), atol=1e-5)
    # rotation part matches so3_exp
    np.testing.assert_allclose(
        np.asarray(T[:3, :3]), np.asarray(lie.so3_exp(tau[3:])), atol=1e-6
    )


def test_apply_delta_left_multiplicative():
    rng = np.random.default_rng(2)
    R0 = Rotation.from_rotvec(rng.normal(size=3)).as_matrix().astype(np.float32)
    t0 = rng.normal(size=3).astype(np.float32)
    tau = jnp.asarray(rng.normal(size=6) * 0.1, jnp.float32)
    R1, t1 = lie.apply_delta(jnp.asarray(R0), jnp.asarray(t0), tau)
    dT = np.asarray(lie.se3_exp(tau))
    T0 = np.eye(4)
    T0[:3, :3], T0[:3, 3] = R0, t0
    T1 = dT @ T0
    np.testing.assert_allclose(np.asarray(R1), T1[:3, :3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(t1), T1[:3, 3], atol=1e-5)


def test_so3_log_roundtrip():
    rng = np.random.default_rng(3)
    theta = rng.normal(size=3)
    theta = theta / np.linalg.norm(theta) * 0.7
    R = lie.so3_exp(jnp.asarray(theta, jnp.float32))
    back = np.asarray(lie.so3_log(R))
    np.testing.assert_allclose(back, theta, atol=1e-5)


def test_relative_translation_norm():
    R = jnp.eye(3)
    ta = jnp.array([1.0, 0.0, 0.0])
    tb = jnp.array([0.0, 2.0, 0.0])
    d = lie.relative_translation_norm(R, ta, R, tb)
    np.testing.assert_allclose(float(d), np.linalg.norm([1.0, -2.0, 0.0]), atol=1e-6)
