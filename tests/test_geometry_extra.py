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


# ---------------------------------------------------------------------------
# N1 completion: surface normals, eta/omega inverse map, signed distance
# (VERDICT round 1, missing #3)
# ---------------------------------------------------------------------------

def _rand_p(key, b=1):
    import jax
    from sqtpu.ops import quaternion as quat
    ka, ke, kt, kq = jax.random.split(key, 4)
    return jnp.concatenate([
        jax.random.uniform(ka, (b, 3), jnp.float64, 25 / 255, 75 / 255),
        jax.random.uniform(ke, (b, 2), jnp.float64, 0.15, 1.0),
        jax.random.uniform(kt, (b, 3), jnp.float64, 0.3, 0.7),
        quat.random_uniform(kq, (b,), jnp.float64),
    ], axis=-1)[0]


def test_surface_normal_sphere_is_radial():
    p = jnp.asarray([0.2, 0.2, 0.2, 1.0, 1.0, 0.5, 0.5, 0.5,
                     0.0, 0.0, 0.0, 1.0], jnp.float64)
    eta = jnp.linspace(-1.2, 1.2, 7, dtype=jnp.float64)
    omega = jnp.linspace(-2.8, 2.8, 7, dtype=jnp.float64)
    E, W = jnp.meshgrid(eta, omega)
    pts = geometry.surface_point(p, E, W)
    n = geometry.surface_normal(p, E, W)
    radial = pts - jnp.asarray([0.5, 0.5, 0.5])
    radial = radial / jnp.linalg.norm(radial, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(n), np.asarray(radial),
                               atol=1e-9)


def test_surface_normal_parallel_to_field_gradient():
    """The closed-form normal must be parallel to ∇F at the surface
    point, for a generic rotated SQ (autodiff cross-check)."""
    import jax
    p = _rand_p(jax.random.PRNGKey(11))
    eta = jnp.asarray([-0.9, -0.3, 0.2, 0.7], jnp.float64)
    omega = jnp.asarray([-2.0, -0.4, 0.9, 2.5], jnp.float64)
    pts = geometry.surface_point(p, eta, omega)
    n = np.asarray(geometry.surface_normal(p, eta, omega))
    g = np.asarray(jax.vmap(jax.grad(
        lambda x: geometry.field_points(x, p, guard=False)))(pts))
    g = g / np.linalg.norm(g, axis=-1, keepdims=True)
    np.testing.assert_allclose(n, g, atol=1e-7)


def test_map_eta_omega_roundtrip():
    import jax
    p = _rand_p(jax.random.PRNGKey(12))
    eta = jnp.asarray([-1.1, -0.5, 0.0, 0.4, 1.3], jnp.float64)
    omega = jnp.asarray([-3.0, -1.6, 0.1, 1.5708, 2.7], jnp.float64)
    E, W = jnp.meshgrid(eta, omega)
    pts = geometry.surface_point(p, E, W)
    eta2, omega2 = geometry.map_eta_omega(pts, p)
    pts2 = geometry.surface_point(p, eta2, omega2)
    # compare reconstructed points (angles themselves have branch cuts)
    np.testing.assert_allclose(np.asarray(pts2), np.asarray(pts),
                               atol=1e-9)


def test_signed_distance_sign_and_magnitude():
    import jax
    p = _rand_p(jax.random.PRNGKey(13))
    t = np.asarray(p[5:8])
    eta = jnp.asarray([-0.8, 0.1, 0.9], jnp.float64)
    omega = jnp.asarray([-2.2, 0.5, 1.9], jnp.float64)
    on = geometry.surface_point(p, eta, omega)
    out = t + (np.asarray(on) - t) * 1.5
    inside = t + (np.asarray(on) - t) * 0.5
    d_on = np.asarray(geometry.signed_distance(on, p))
    d_out = np.asarray(geometry.signed_distance(jnp.asarray(out), p))
    d_in = np.asarray(geometry.signed_distance(jnp.asarray(inside), p))
    assert np.all(np.abs(d_on) < 1e-9)
    assert np.all(d_out > 0)
    assert np.all(d_in < 0)
    # |sdistance| == radial distance (the unsigned sq::distance)
    r_out = np.asarray(geometry.radial_distance(jnp.asarray(out), p))
    np.testing.assert_allclose(np.abs(d_out), r_out, rtol=1e-12)
    # sphere: signed distance is the exact euclidean distance
    ps = jnp.asarray([0.2, 0.2, 0.2, 1.0, 1.0, 0.5, 0.5, 0.5,
                      0.0, 0.0, 0.0, 1.0], jnp.float64)
    q_out = jnp.asarray([[0.5, 0.5, 0.9]], jnp.float64)
    d = float(geometry.signed_distance(q_out, ps)[0])
    # 1e-5 slack: the reference's +1e-4 zero-guard on squared coords
    # perturbs points sitting exactly on an axis
    assert abs(d - 0.2) < 1e-5
