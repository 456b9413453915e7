"""SQ rotation-symmetry-aware losses and metrics.

A superquadric is exactly invariant under 180° rotations about its
principal axes (its inside-outside F uses squared body coordinates), so
a quaternion label is only defined up to that D2 orbit. These tests pin
(a) the geometric fact itself (flipped params render identical images /
IoU 1.0) and (b) that the sym-aware loss/metric are zero across the
orbit while the raw ones are not.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqtpu.ops import geometry, losses, metrics
from sqtpu.ops import quaternion as quat
from sqtpu.ops.render import render_depth_hard


@pytest.fixture(scope="module")
def params():
    key = jax.random.PRNGKey(5)
    ka, ke, kt, kq = jax.random.split(key, 4)
    b = 3
    return jnp.concatenate([
        jax.random.uniform(ka, (b, 3), jnp.float32, 25 / 255, 75 / 255),
        jax.random.uniform(ke, (b, 2), jnp.float32, 0.1, 1.0),
        jax.random.uniform(kt, (b, 3), jnp.float32, 88 / 255, 168 / 255),
        quat.random_uniform(kq, (b,), jnp.float32),
    ], axis=-1)


def _flipped(p, flip_idx):
    f = jnp.asarray(losses.SQ_FLIP_QUATS[flip_idx], p.dtype)
    a, e, t, q = geometry.split_params(p)
    qf = quat.multiply(q, jnp.broadcast_to(f, q.shape))
    return jnp.concatenate([a, e, t, qf], axis=-1)


@pytest.mark.parametrize("flip_idx", [1, 2, 3])
def test_flips_are_exact_geometric_symmetries(params, flip_idx):
    """Flipped params produce the SAME voxelization (IoU 1.0) and the
    same rendered depth image — the labels are genuinely ambiguous."""
    pf = _flipped(params, flip_idx)
    per = metrics.iou(params, pf, render_size=32, reduce=False)
    np.testing.assert_allclose(np.asarray(per), 1.0, atol=1e-6)

    img_a = render_depth_hard(params[0], 64, quantize=True)
    img_b = render_depth_hard(pf[0], 64, quantize=True)
    # hard renders bit-match except bisection rounding at silhouette edges
    same = np.mean(np.asarray(img_a) == np.asarray(img_b))
    assert same > 0.999


def test_sym_quaternion_loss_zero_on_orbit(params):
    _, _, _, q = geometry.split_params(params)
    for flip_idx in range(4):
        qf = geometry.split_params(_flipped(params, flip_idx)).q
        v = float(losses.quaternion_loss_sym(qf, q))
        assert v < 1e-4, f"flip {flip_idx}: {v}"
        # ... and for -q too (double cover)
        v = float(losses.quaternion_loss_sym(-qf, q))
        assert v < 1e-4
    # a genuinely different rotation is NOT zero
    q_other = quat.random_uniform(jax.random.PRNGKey(9), (3,), jnp.float32)
    assert float(losses.quaternion_loss_sym(q_other, q)) > 0.05


def test_sym_angle_error_zero_on_orbit(params):
    _, _, _, q = geometry.split_params(params)
    for flip_idx in range(1, 4):
        qf = geometry.split_params(_flipped(params, flip_idx)).q
        raw = np.asarray(metrics.angle_error(q, qf))
        sym = np.asarray(metrics.angle_error_sym(q, qf))
        np.testing.assert_allclose(raw, np.pi, atol=1e-5)  # raw sees a flip
        np.testing.assert_allclose(sym, 0.0, atol=1e-5)    # sym does not


def test_iou_full_columns(params):
    out = np.asarray(metrics.iou_full(params, jnp.roll(params, 1, axis=0),
                                      render_size=16))
    assert out.shape == (3, 7)
    assert np.all(out[:, 3] <= out[:, 2] + 1e-6)  # sym-angle <= raw angle


def test_sym_loss_well_posed_on_sphere(params):
    """The TANGENT gradient (ambient grad projected onto the unit-sphere
    tangent space) must vanish at every orbit member — each is a true
    minimum. And unlike the reference loss shape, a 180° error about a
    NON-principal axis must NOT score zero."""
    _, _, _, q = geometry.split_params(params)
    for flip_idx in range(4):
        qf = geometry.split_params(_flipped(params, flip_idx)).q
        g = np.asarray(jax.grad(
            lambda qp: losses.quaternion_loss_sym(qp, q))(qf))
        qf_n = np.asarray(qf)
        g_tan = g - (g * qf_n).sum(-1, keepdims=True) * qf_n
        assert np.abs(g_tan).max() < 1e-4, f"flip {flip_idx}"

    # 180° about the axis bisecting x/y (not principal for generic SQs)
    f_diag = jnp.asarray([1.0, 1.0, 0.0, 0.0], q.dtype) / jnp.sqrt(2.0)
    q_bad = quat.multiply(q, jnp.broadcast_to(f_diag, q.shape))
    v = np.asarray(losses.quaternion_loss_sym(q_bad, q, reduce=False))
    assert np.all(v > 0.2)
    # ...whereas the reference shape scores it (wrongly) as near-perfect
    ref = np.asarray(losses.quaternion_loss(q_bad, q, reduce=False))
    assert np.all(np.abs(ref) < 0.5)


def test_rotation_moment_loss_properties(params):
    """Observability-weighted second-moment rotation loss: zero at truth
    and at every D2 flip, zero for rotationally-symmetric shapes (no
    gradient noise from unobservable rotation), positive otherwise."""
    _, _, _, q = geometry.split_params(params)
    assert float(losses.rotation_moment_loss(q, params)) < 1e-10
    for flip_idx in range(1, 4):
        qf = geometry.split_params(_flipped(params, flip_idx)).q
        assert float(losses.rotation_moment_loss(qf, params)) < 1e-10
    q_other = quat.random_uniform(jax.random.PRNGKey(3), (3,),
                                  params.dtype)
    assert float(losses.rotation_moment_loss(q_other, params)) > 1e-3
    # spheres: any rotation is correct -> exactly zero loss
    p_sph = params.at[:, 1].set(params[:, 0]).at[:, 2].set(params[:, 0])
    p_sph = p_sph.at[:, 3].set(1.0).at[:, 4].set(1.0)
    assert float(losses.rotation_moment_loss(q_other, p_sph)) < 1e-10


# ---------------------------------------------------------------------------
# D4 gauge group (round 3): a z quarter-turn + a1<->a2 swap is ALSO exact
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("gi", list(range(8)))
def test_gauge_orbit_members_are_exact_equivalences(params, gi):
    """Every element of param_gauge_orbit voxelizes AND renders
    identically to the original — the decomposition is gauge."""
    orbit = losses.param_gauge_orbit(params)
    pg = orbit[gi]
    per = metrics.iou(params, pg, render_size=32, reduce=False)
    np.testing.assert_allclose(np.asarray(per), 1.0, atol=1e-6)
    img_a = render_depth_hard(params[0], 64, quantize=True)
    img_b = render_depth_hard(pg[0], 64, quantize=True)
    same = np.mean(np.asarray(img_a) == np.asarray(img_b))
    assert same > 0.999


def test_gauge_loss_zero_on_orbit_positive_off(params):
    orbit = losses.param_gauge_orbit(params)
    for gi in range(8):
        v = float(losses.param_gauge_loss(orbit[gi], params))
        assert v < 1e-5, (gi, v)  # fp32 quat-multiply rounding
    # a genuinely rotated prediction is penalized
    bad = params.at[:, 8:12].set(
        jnp.asarray([0.3, 0.2, 0.5, 0.78], params.dtype))
    assert float(losses.param_gauge_loss(bad, params)) > 1e-3


def test_gauge_align_recovers_swap(params):
    """A prediction equal to the swapped decomposition aligns to it:
    gauge angle 0, swapped flag set, while the D2 sym-angle sees ~pi/2."""
    orbit = losses.param_gauge_orbit(params)
    pred = orbit[4]  # Rz(+90) + size swap
    aligned, swapped = metrics.gauge_align(params, pred)
    np.testing.assert_allclose(np.asarray(aligned), np.asarray(pred),
                               atol=1e-6)
    assert bool(np.all(np.asarray(swapped)))
    ang_g = metrics.angle_error_gauge(params, pred)
    np.testing.assert_allclose(np.asarray(ang_g), 0.0, atol=1e-5)
    ang_sym = metrics.angle_error_sym(params[:, 8:12], pred[:, 8:12])
    assert float(np.min(np.asarray(ang_sym))) > 1.0  # ~pi/2 under D2 only


def test_iou_full_gauge_columns(params):
    """iou_full returns the 7-column triple; a swapped-decomposition
    prediction scores gauge rot-IoU 1.0 but D2 rot-IoU < 1."""
    pred = losses.param_gauge_orbit(params)[4]
    out = np.asarray(metrics.iou_full(params, pred, render_size=32))
    assert out.shape == (params.shape[0], 7)
    np.testing.assert_allclose(out[:, 5], 1.0, atol=1e-6)  # gauge rot-IoU
    np.testing.assert_allclose(out[:, 1], 1.0, atol=1e-6)  # full IoU
    np.testing.assert_allclose(out[:, 6], 1.0, atol=1e-6)  # swap flag
    np.testing.assert_allclose(out[:, 4], 0.0, atol=1e-5)  # gauge angle


def test_canonicalize_gauge(params):
    """Canonical gauge: a1 >= a2, identical geometry, idempotent."""
    pc = losses.canonicalize_gauge(params)
    pc = np.asarray(pc)
    assert np.all(pc[:, 0] >= pc[:, 1])
    per = metrics.iou(params, jnp.asarray(pc), render_size=32, reduce=False)
    np.testing.assert_allclose(np.asarray(per), 1.0, atol=1e-6)
    img_a = render_depth_hard(params[0], 64, quantize=True)
    img_b = render_depth_hard(jnp.asarray(pc)[0], 64, quantize=True)
    assert np.mean(np.asarray(img_a) == np.asarray(img_b)) > 0.999
    pcc = np.asarray(losses.canonicalize_gauge(jnp.asarray(pc)))
    np.testing.assert_allclose(pcc, pc, atol=1e-6)   # idempotent
    # quaternions stay unit
    np.testing.assert_allclose(np.linalg.norm(pc[:, 8:12], axis=-1), 1.0,
                               atol=1e-5)


def test_sample_params_canonical_default():
    from sqtpu.data.synthetic import sample_params
    p = np.asarray(sample_params(jax.random.PRNGKey(0), 64))
    assert np.all(p[:, 0] >= p[:, 1])
    p_raw = np.asarray(sample_params(jax.random.PRNGKey(0), 64,
                                     canonical=False))
    assert not np.all(p_raw[:, 0] >= p_raw[:, 1])
    # same shapes: the canonical batch is the gauge-fixed version
    np.testing.assert_allclose(
        np.asarray(losses.canonicalize_gauge(jnp.asarray(p_raw))), p,
        atol=1e-6)
