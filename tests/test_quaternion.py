import numpy as np
import jax.numpy as jnp
import pytest

from evosoro_tpu.core import quaternion as q


def _random_unit_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 4))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_multiply_matches_hamilton():
    rng = np.random.default_rng(1)
    a = _random_unit_quats(16, 1)
    b = _random_unit_quats(16, 2)
    got = np.asarray(q.quat_multiply(jnp.asarray(a), jnp.asarray(b)))
    for i in range(16):
        w1, x1, y1, z1 = a[i]
        w2, x2, y2, z2 = b[i]
        expect = np.array([
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ])
        np.testing.assert_allclose(got[i], expect, atol=1e-12)


def test_rotate_round_trip():
    quats = jnp.asarray(_random_unit_quats(32, 3))
    vs = jnp.asarray(np.random.default_rng(4).normal(size=(32, 3)))
    rotated = q.quat_rotate(quats, vs)
    back = q.quat_rotate_inv(quats, rotated)
    np.testing.assert_allclose(np.asarray(back), np.asarray(vs), atol=1e-10)


def test_rotate_matches_matrix():
    rng = np.random.default_rng(5)
    quats = _random_unit_quats(8, 5)
    vs = rng.normal(size=(8, 3))
    got = np.asarray(q.quat_rotate(jnp.asarray(quats), jnp.asarray(vs)))
    for i in range(8):
        w, x, y, z = quats[i]
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ])
        np.testing.assert_allclose(got[i], R @ vs[i], atol=1e-10)


def test_rotation_vector_round_trip():
    rng = np.random.default_rng(6)
    rv = rng.normal(size=(64, 3)) * 0.5
    quats = q.quat_from_rotation_vector(jnp.asarray(rv))
    back = q.quat_to_rotation_vector(quats)
    np.testing.assert_allclose(np.asarray(back), rv, atol=1e-4)  # fast acos path


def test_from_angle_to_pos_x():
    rng = np.random.default_rng(7)
    # general-angle vectors
    v = rng.normal(size=(64, 3)) + np.array([2.0, 0, 0])
    quat = q.quat_from_angle_to_pos_x(jnp.asarray(v))
    rotated = np.asarray(q.quat_rotate(quat, jnp.asarray(v)))
    norms = np.linalg.norm(v, axis=-1)
    np.testing.assert_allclose(rotated[:, 0], norms, rtol=1e-3)
    np.testing.assert_allclose(rotated[:, 1:], 0.0, atol=np.max(norms) * 2e-2)


def test_from_angle_to_pos_x_small_angle():
    v = jnp.asarray([[1.0, 1e-4, -2e-4]])
    quat = q.quat_from_angle_to_pos_x(v)
    rotated = np.asarray(q.quat_rotate(quat, v))[0]
    np.testing.assert_allclose(rotated[0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(rotated[1:], 0.0, atol=1e-8)


def test_normalize_fast_snaps_identity():
    nearly = jnp.asarray([[1.0 + 1e-9, 1e-12, 0.0, 0.0]])
    out = np.asarray(q.quat_normalize_fast(nearly))[0]
    assert out[0] == 1.0 and np.all(out[1:] == 0)


def test_identity_rotation_vector_is_zero():
    ident = q.quat_identity((4,))
    rv = np.asarray(q.quat_to_rotation_vector(ident))
    np.testing.assert_array_equal(rv, 0.0)
