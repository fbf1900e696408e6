import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgslam_tpu.geometry import se3


def random_quat(rng, shape=()):
    q = rng.normal(size=shape + (4,)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(q)


def random_se3(rng, shape=()):
    q = random_quat(rng, shape)
    t = jnp.asarray(rng.normal(size=shape + (3,)).astype(np.float32))
    return se3.se3_make(q, t)


def test_quat_rotate_matches_matrix(rng):
    q = random_quat(rng, (64,))
    v = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    r1 = se3.quat_rotate(q, v)
    r2 = jnp.einsum("...ij,...j->...i", se3.quat_to_mat(q), v)
    np.testing.assert_allclose(r1, r2, atol=1e-5)


def test_mat_quat_roundtrip(rng):
    q = random_quat(rng, (128,))
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    q2 = se3.mat_to_quat(se3.quat_to_mat(q))
    np.testing.assert_allclose(q, q2, atol=1e-5)


def test_mat_quat_roundtrip_edge_cases():
    # 180-degree rotations about each axis hit every Shepperd pivot branch.
    for axis in range(3):
        w = np.zeros(3, np.float32)
        w[axis] = np.pi
        q = se3.so3_exp_quat(jnp.asarray(w))
        m = se3.quat_to_mat(q)
        q2 = se3.mat_to_quat(m)
        np.testing.assert_allclose(se3.quat_to_mat(q2), m, atol=1e-5)


def test_so3_exp_log_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    w2 = se3.so3_log(se3.so3_exp_quat(w))
    np.testing.assert_allclose(w, w2, atol=1e-4)


def test_so3_small_angle():
    w = jnp.asarray([[1e-9, 0, 0], [0.0, 0, 0]], dtype=jnp.float32)
    q = se3.so3_exp_quat(w)
    np.testing.assert_allclose(q[:, 0], 1.0, atol=1e-6)
    assert np.all(np.isfinite(np.asarray(se3.so3_log(q))))


def test_se3_compose_inverse(rng):
    T = random_se3(rng, (32,))
    eye = se3.se3_compose(T, se3.se3_inverse(T))
    np.testing.assert_allclose(np.abs(eye[..., 0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(eye[..., 4:], 0.0, atol=1e-5)


def test_se3_apply_matches_matrix(rng):
    T = random_se3(rng, (16,))
    x = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    y1 = se3.se3_apply(T, x)
    m = se3.se3_to_matrix(T)
    y2 = jnp.einsum("...ij,...j->...i", m[..., :3, :3], x) + m[..., :3, 3]
    np.testing.assert_allclose(y1, y2, atol=1e-5)


def test_se3_exp_log_roundtrip(rng):
    xi = jnp.asarray(0.5 * rng.normal(size=(64, 6)).astype(np.float32))
    xi2 = se3.se3_log(se3.se3_exp(xi))
    np.testing.assert_allclose(xi, xi2, atol=1e-4)


def test_se3_exp_zero():
    T = se3.se3_exp(jnp.zeros(6))
    np.testing.assert_allclose(T, se3.se3_identity(), atol=1e-7)


def test_se3_log_small_angle_no_cancellation():
    """Regression: f32 cancellation in V^-1 blew up se3_log for
    1e-4 < theta < 0.05 (broke BA's convergence metric)."""
    for theta in (1e-5, 1e-4, 5e-4, 2e-3, 1e-2, 4e-2):
        w = np.array([theta, 0.3 * theta, -0.2 * theta], np.float32)
        w /= np.linalg.norm(w) / theta
        t = np.array([4e-4, 3e-4, 7e-5], np.float32)
        T = se3.se3_make(se3.so3_exp_quat(jnp.asarray(w)), jnp.asarray(t))
        xi = np.asarray(se3.se3_log(T))
        assert np.abs(xi[:3]).max() < 1e-2, (theta, xi)
        T2 = se3.se3_exp(jnp.asarray(xi))
        np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=1e-5)


def test_se3_matrix_roundtrip(rng):
    T = random_se3(rng, (16,))
    T2 = se3.se3_from_matrix(se3.se3_to_matrix(T))
    np.testing.assert_allclose(se3.se3_to_matrix(T2), se3.se3_to_matrix(T),
                               atol=1e-5)


def test_sim3_compose_inverse(rng):
    q = random_quat(rng, (16,))
    t = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    s = jnp.asarray(np.exp(rng.normal(size=(16, 1)) * 0.3).astype(np.float32))
    S = jnp.concatenate([q, t, s], axis=-1)
    eye = se3.sim3_compose(S, se3.sim3_inverse(S))
    np.testing.assert_allclose(np.abs(eye[..., 0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(eye[..., 4:7], 0.0, atol=1e-4)
    np.testing.assert_allclose(eye[..., 7], 1.0, atol=1e-5)


def test_sim3_apply_scale(rng):
    S = se3.sim3_identity()
    S = S.at[7].set(2.0)
    x = jnp.asarray([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(se3.sim3_apply(S, x), 2.0 * x, atol=1e-6)


def test_sim3_exp_log_roundtrip(rng):
    xi = jnp.asarray(0.4 * rng.normal(size=(32, 7)).astype(np.float32))
    S = se3.sim3_exp(xi)
    xi2 = se3.sim3_log(S)
    np.testing.assert_allclose(xi, xi2, atol=2e-3)


def test_sim3_exp_reduces_to_se3():
    rng = np.random.default_rng(1)
    xi6 = jnp.asarray(0.5 * rng.normal(size=(8, 6)).astype(np.float32))
    xi7 = jnp.concatenate([xi6, jnp.zeros((8, 1))], axis=-1)
    S = se3.sim3_exp(xi7)
    T = se3.se3_exp(xi6)
    # Two mathematically identical f32 formulations; rounding differs ~1e-3.
    np.testing.assert_allclose(S[..., :7], T, atol=2e-3)
    np.testing.assert_allclose(S[..., 7], 1.0, atol=1e-6)


def test_jit_and_vmap():
    rng = np.random.default_rng(2)
    xi = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
    f = jax.jit(jax.vmap(se3.se3_exp))
    np.testing.assert_allclose(f(xi), se3.se3_exp(xi), atol=1e-6)
