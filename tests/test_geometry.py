"""Unit tests for SQ geometry: field, surface sampling, volume, inertia."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqtpu.ops import geometry


def _sphere(radius=0.2, center=(0.5, 0.5, 0.5)):
    return jnp.asarray(
        [radius, radius, radius, 1.0, 1.0, *center, 0.0, 0.0, 0.0, 1.0],
        dtype=jnp.float64,
    )


def test_field_sphere_inside_outside():
    p = _sphere()
    pts = jnp.asarray(
        [[0.5, 0.5, 0.5],   # center: inside
         [0.69, 0.5, 0.5],  # just inside surface (r=0.19)
         [0.71, 0.5, 0.5],  # just outside (r=0.21)
         [0.9, 0.9, 0.9]],  # far outside
        dtype=jnp.float64,
    )
    f = np.asarray(geometry.field_points(pts, p, guard=False))
    assert f[0] < 1 and f[1] < 1
    assert f[2] > 1 and f[3] > 1


def test_field_rotation_invariance_of_sphere():
    """A sphere's field must be invariant to the quaternion."""
    from sqtpu.ops import quaternion as quat

    q = quat.random_uniform(jax.random.PRNGKey(7), (), jnp.float64)
    p1 = _sphere()
    p2 = p1.at[8:12].set(q)
    ax = geometry.make_axis(32, "iou", dtype=jnp.float64)
    f1 = np.asarray(geometry.field_grid(ax, ax, ax, p1, guard=False))
    f2 = np.asarray(geometry.field_grid(ax, ax, ax, p2, guard=False))
    np.testing.assert_allclose(f1, f2, rtol=1e-9)


def test_grid_kinds():
    ex = np.asarray(geometry.make_axis(32, "explicit", jnp.float64))
    im = np.asarray(geometry.make_axis(32, "implicit", jnp.float64))
    io = np.asarray(geometry.make_axis(32, "iou", jnp.float64))
    assert ex.shape == (33,) and im.shape == (32,) and io.shape == (32,)
    assert ex[0] == 1e-4 and im[0] == 1e-4 and io[0] == 0.0
    assert ex[-1] == 1.0 and im[-1] == 1.0 and io[-1] == 1.0


def test_clamp_params():
    p = jnp.asarray([0.0, 2.0, 0.5, 0.0, 2.0, -1.0, 2.0, 0.5, 0.0, 0.0, 0.0, 1.0],
                    dtype=jnp.float64)
    c = np.asarray(geometry.clamp_params(p))
    assert c[0] == 0.05 and c[1] == 1.0 and c[2] == 0.5       # a
    assert c[3] == 0.1 and c[4] == 1.0                          # e
    assert c[5] == 0.0 and c[6] == 1.0 and c[7] == 0.5          # t
    np.testing.assert_array_equal(c[8:], np.asarray(p[8:]))     # q untouched


def test_surface_points_on_surface():
    """Sampled surface points must satisfy F ≈ 1 (away from poles)."""
    p = jnp.asarray(
        [0.2, 0.15, 0.25, 0.6, 0.8, 0.5, 0.4, 0.6, 0.1, 0.2, -0.3, 0.927],
        dtype=jnp.float64,
    )
    p = p.at[8:12].set(p[8:12] / jnp.linalg.norm(p[8:12]))
    pts = geometry.sample_surface(p, 32, 16, dtype=jnp.float64)
    f = np.asarray(geometry.field_points(pts, p, guard=False))
    # tolerance loose at the pole samples where |sg|≈1 and cos gamma ≈ 0
    assert np.median(np.abs(f - 1.0)) < 1e-6
    assert np.percentile(np.abs(f - 1.0), 90) < 1e-3


def test_volume_sphere():
    p = _sphere(radius=0.2)
    v = float(geometry.volume(p))
    assert v == pytest.approx(4.0 / 3.0 * np.pi * 0.2**3, rel=1e-6)


def test_volume_box_limit():
    """e → 0 approaches the bounding box volume 8·a1a2a3."""
    p = jnp.asarray([0.1, 0.2, 0.3, 0.01, 0.01, 0.5, 0.5, 0.5, 0, 0, 0, 1],
                    dtype=jnp.float64)
    v = float(geometry.volume(p))
    assert v == pytest.approx(8 * 0.1 * 0.2 * 0.3, rel=0.05)


def test_inertia_sphere():
    p = _sphere(radius=0.2)
    i = np.asarray(geometry.inertia(p))
    expect = 8.0 * np.pi * 0.2**5 / 15.0  # (2/5) M r² at unit density
    np.testing.assert_allclose(i, expect, rtol=1e-6)


def test_field_grad_finite():
    p = _sphere().at[8:12].set(
        jnp.asarray([0.1, 0.2, -0.3, 0.927], dtype=jnp.float64)
    )
    p = p.at[8:12].set(p[8:12] / jnp.linalg.norm(p[8:12]))
    ax = geometry.make_axis(16, "implicit", dtype=jnp.float64)

    def loss(pp):
        return jnp.sum(jax.nn.sigmoid(1.0 - geometry.field_grid(ax, ax, ax, pp)))

    g = np.asarray(jax.grad(loss)(p))
    assert np.all(np.isfinite(g))
    assert np.any(g != 0)
