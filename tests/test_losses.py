"""Loss-function behavior tests beyond the goldens."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqtpu.ops import losses
from sqtpu.ops import quaternion as quat
from sqtpu.ops.render import render_depth_soft

pytestmark = pytest.mark.slow  # heavy: excluded from -m 'not slow'


@pytest.fixture()
def batch():
    key = jax.random.PRNGKey(3)
    ka, ke, kt, kq = jax.random.split(key, 4)
    b = 4
    a = jax.random.uniform(ka, (b, 3), jnp.float64, 25 / 255, 75 / 255)
    e = jax.random.uniform(ke, (b, 2), jnp.float64, 0.1, 1.0)
    t = jax.random.uniform(kt, (b, 3), jnp.float64, 88 / 255, 168 / 255)
    q = quat.random_uniform(kq, (b,), jnp.float64)
    return jnp.concatenate([a, e, t, q], axis=-1)


def test_explicit_batch_equals_mean_of_singles(batch):
    full = float(losses.explicit_loss(batch, jnp.roll(batch, 1, axis=0), 16))
    singles = [
        float(losses.explicit_loss(batch[i:i+1],
                                   jnp.roll(batch, 1, axis=0)[i:i+1], 16))
        for i in range(batch.shape[0])
    ]
    assert full == pytest.approx(np.mean(singles), abs=1e-12)


def test_explicit_reduce_false(batch):
    per = losses.explicit_loss(batch, jnp.roll(batch, 1, axis=0), 16,
                               reduce=False)
    assert per.shape == (4,)
    assert float(jnp.mean(per)) == pytest.approx(
        float(losses.explicit_loss(batch, jnp.roll(batch, 1, axis=0), 16)),
        abs=1e-12,
    )


def test_implicit_self_render_is_near_zero(batch):
    """Rendering params then measuring implicit loss on that render ≈ 0."""
    imgs = jax.vmap(lambda p: render_depth_soft(p, 32, 1.5, 260.0))(batch)
    v = float(losses.implicit_loss(imgs, batch, 32, 1.5, 260.0))
    assert v == pytest.approx(0.0, abs=1e-9)


def test_implicit_accepts_nchw_and_nhw(batch):
    imgs = jax.vmap(lambda p: render_depth_soft(p, 32, 1.5, 260.0))(batch)
    v1 = float(losses.implicit_loss(imgs, batch, 32))
    v2 = float(losses.implicit_loss(imgs[:, None], batch, 32))
    assert v1 == pytest.approx(v2, abs=1e-15)


def test_gradients_flow_through_all_losses(batch, golden_image):
    img = jnp.asarray(golden_image)[None].repeat(4, axis=0)

    for fn in (
        lambda p: losses.explicit_loss(batch, p, 16),
        lambda p: losses.implicit_loss(img, p, 32),
        lambda p: losses.least_squares_loss(img, p, 32),
    ):
        g = np.asarray(jax.grad(fn)(batch))
        assert np.all(np.isfinite(g))
        assert np.any(g != 0)


def test_quaternion_loss_range():
    key = jax.random.PRNGKey(9)
    q1 = quat.random_uniform(key, (32,), jnp.float64)
    q2 = quat.random_uniform(jax.random.PRNGKey(10), (32,), jnp.float64)
    v = np.asarray(losses.quaternion_loss(q1, q2, reduce=False))
    assert np.all(v >= -1e-12) and np.all(v <= 1.0 + 1e-12)
    same = np.asarray(losses.quaternion_loss(q1, q1, reduce=False))
    np.testing.assert_allclose(same, 0.0, atol=1e-10)


def test_keras_occupancy_mse_zero_on_identical(batch):
    assert float(losses.keras_occupancy_mse(batch, batch, 32)) == pytest.approx(
        0.0, abs=1e-12
    )


def test_keras_occupancy_mse_positive_on_different(batch):
    other = batch.at[:, 0].add(0.1)
    assert float(losses.keras_occupancy_mse(batch, other, 32)) > 0


def test_param_mse_matches_numpy(batch):
    other = jnp.roll(batch, 1, axis=0)
    v = float(losses.param_mse(batch, other))
    assert v == pytest.approx(
        float(np.mean((np.asarray(batch) - np.asarray(other)) ** 2)), rel=1e-12
    )
