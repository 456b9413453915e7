"""Tests for radial distance / image utilities added for N1 parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from sqtpu.ops import geometry
from sqtpu.ops.image import depth_to_points, norm_img


def test_radial_distance_sphere():
    p = jnp.asarray([0.2, 0.2, 0.2, 1.0, 1.0, 0.5, 0.5, 0.5, 0, 0, 0, 1],
                    dtype=jnp.float64)
    pts = jnp.asarray([
        [0.8, 0.5, 0.5],   # 0.3 from center -> 0.1 outside
        [0.6, 0.5, 0.5],   # 0.1 from center -> 0.1 inside
        [0.7, 0.5, 0.5],   # exactly on surface
    ], dtype=jnp.float64)
    d = np.asarray(geometry.radial_distance(pts, p))
    # tolerances account for the reference's +1e-4 zero-guard on squares
    assert d[0] == pytest.approx(0.1, abs=1e-4)
    assert d[1] == pytest.approx(0.1, abs=1e-4)
    assert d[2] == pytest.approx(0.0, abs=1e-4)


def test_norm_img():
    img = jnp.asarray([[2.0, 4.0], [6.0, 10.0]])
    out = np.asarray(norm_img(img))
    assert out.min() == 0.0 and out.max() == 1.0


def test_depth_to_points():
    img = np.zeros((4, 4), dtype=np.uint8)
    img[1, 2] = 7
    pts = depth_to_points(img, flip_vertical=True)
    # flip: row 1 becomes row 2; x=col=2, y=row(after flip)=2, z=7
    assert pts.shape == (1, 3)
    np.testing.assert_array_equal(pts[0], [2, 2, 7])


def test_pose_matrix_and_inverse():
    import jax
    from sqtpu.ops import quaternion as quat

    q = quat.random_uniform(jax.random.PRNGKey(2), (), jnp.float64)
    p = jnp.concatenate([jnp.asarray([0.2, 0.3, 0.1, 0.5, 0.5], jnp.float64),
                         jnp.asarray([0.4, 0.5, 0.6], jnp.float64), q])
    m = geometry.pose_matrix(p)
    mi = geometry.pose_inverse(m)
    np.testing.assert_allclose(np.asarray(m @ mi), np.eye(4), atol=1e-12)


def test_transform_params_field_consistency():
    """F at a point of the original SQ == F at the transformed point of
    the transformed SQ."""
    import jax
    from sqtpu.ops import quaternion as quat

    key = jax.random.PRNGKey(5)
    q = quat.random_uniform(key, (), jnp.float64)
    p = jnp.concatenate([jnp.asarray([0.2, 0.15, 0.25, 0.6, 0.8], jnp.float64),
                         jnp.asarray([0.5, 0.5, 0.5], jnp.float64),
                         quat.random_uniform(jax.random.fold_in(key, 1), (),
                                             jnp.float64)])
    t2 = jnp.asarray([0.05, -0.03, 0.02], jnp.float64)
    p2 = geometry.transform_params(p, q, t2)

    pts = jax.random.uniform(jax.random.fold_in(key, 2), (16, 3),
                             jnp.float64, 0.3, 0.7)
    pts2 = quat.rotate(pts, q[None, :]) + t2[None, :]
    f1 = np.asarray(geometry.field_points(pts, p, guard=False))
    f2 = np.asarray(geometry.field_points(pts2, p2, guard=False))
    np.testing.assert_allclose(f2, f1, rtol=1e-9)
