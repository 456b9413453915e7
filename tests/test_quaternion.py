"""Unit tests for the quaternion library (reference: torch/quaternion.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqtpu.ops import quaternion as quat


def _np_quat2mat(q):
    """Independent numpy oracle — reference torch/helpers.py:17-24."""
    u = q / np.sqrt(np.square(q).sum())
    x, y, z, w = u
    return np.array([
        [1 - 2 * (y**2 + z**2), 2*x*y - 2*w*z, 2*x*z + 2*w*y],
        [2*x*y + 2*w*z, 1 - 2*(x**2 + z**2), 2*y*z - 2*w*x],
        [2*x*z - 2*w*y, 2*y*z + 2*w*x, 1 - 2*(x**2 + y**2)],
    ])


@pytest.fixture()
def qs():
    key = jax.random.PRNGKey(42)
    return quat.random_uniform(key, (16,), dtype=jnp.float64)


def test_random_uniform_unit_norm(qs):
    np.testing.assert_allclose(np.linalg.norm(np.asarray(qs), axis=-1), 1.0,
                               atol=1e-12)


def test_to_matrix_matches_reference_oracle(qs):
    for q in np.asarray(qs):
        np.testing.assert_allclose(
            np.asarray(quat.to_matrix(jnp.asarray(q))), _np_quat2mat(q),
            atol=1e-12,
        )


def test_to_matrix_is_rotation(qs):
    mats = np.asarray(quat.to_matrix(qs))
    for m in mats:
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(m) == pytest.approx(1.0, abs=1e-12)


def test_rotate_agrees_with_matrix(qs):
    pts = np.random.default_rng(0).normal(size=(16, 3))
    r1 = np.asarray(quat.rotate(jnp.asarray(pts), qs))
    mats = np.asarray(quat.to_matrix(qs))
    r2 = np.einsum("bij,bj->bi", mats, pts)
    np.testing.assert_allclose(r1, r2, atol=1e-12)


def test_conjugate_inverts_rotation(qs):
    pts = np.random.default_rng(1).normal(size=(16, 3))
    rotated = quat.rotate(jnp.asarray(pts), qs)
    back = np.asarray(quat.rotate(rotated, quat.conjugate(qs)))
    np.testing.assert_allclose(back, pts, atol=1e-12)


def test_multiply_identity(qs):
    ident = jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=jnp.float64)
    out = quat.multiply(qs, jnp.broadcast_to(ident, qs.shape))
    np.testing.assert_allclose(np.asarray(out), np.asarray(qs), atol=1e-15)


def test_from_matrix_roundtrip(qs):
    mats = quat.to_matrix(qs)
    back = quat.from_matrix(mats)
    # q and -q are the same rotation; compare matrices
    np.testing.assert_allclose(
        np.asarray(quat.to_matrix(back)), np.asarray(mats), atol=1e-10
    )


def test_to_magnitude():
    # 90° about z: q = (0, 0, sin45, cos45)
    s = np.sqrt(0.5)
    q = jnp.asarray([0.0, 0.0, s, s], dtype=jnp.float64)
    assert float(quat.to_magnitude(q)) == pytest.approx(np.pi / 2, abs=1e-12)


def test_slerp_endpoints(qs):
    q0, q1 = qs[0], qs[1]
    t = jnp.asarray([0.0, 1.0], dtype=jnp.float64)
    out = np.asarray(quat.slerp(q0, q1, t))
    np.testing.assert_allclose(out[0], np.asarray(q0), atol=1e-9)
    # endpoint may be ±q1 depending on hemisphere fix
    end = out[1] if np.dot(out[1], np.asarray(q1)) > 0 else -out[1]
    np.testing.assert_allclose(end, np.asarray(q1), atol=1e-9)


def test_slerp_unit_norm(qs):
    t = jnp.linspace(0.0, 1.0, 11, dtype=jnp.float64)
    out = np.asarray(quat.slerp(qs[2], qs[3], t))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-9)


def test_jit_and_grad():
    q = quat.random_uniform(jax.random.PRNGKey(0), (), jnp.float64)
    g = jax.grad(lambda qq: jnp.sum(quat.to_matrix(qq)))(q)
    assert np.all(np.isfinite(np.asarray(g)))
    jit_mult = jax.jit(quat.multiply)
    np.testing.assert_allclose(
        np.asarray(jit_mult(q, q)), np.asarray(quat.multiply(q, q)), atol=1e-15
    )
