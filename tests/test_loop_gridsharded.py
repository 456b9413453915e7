"""Train step with an active grid axis (n_grid > 1): DP x SP end-to-end,
and the DP x Pallas composition (VERDICT weak #4)."""

import os

os.environ["SQTPU_PALLAS_INTERPRET"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

from sqtpu.models import ResNetSQ
from sqtpu.parallel.mesh import make_mesh
from sqtpu.training.loop import make_train_step
from sqtpu.training.state import create_train_state
from sqtpu.utils.config import TrainConfig

import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from -m 'not slow'


def test_train_step_with_grid_axis():
    cfg = TrainConfig(image_size=32, render_size=16, batch_size=4,
                      use_pallas=False, donate=False, n_grid=2)
    mesh = make_mesh(n_grid=2)
    assert dict(mesh.shape) == {"data": 4, "grid": 2}
    model = ResNetSQ()
    state = create_train_state(model, jax.random.PRNGKey(0), cfg,
                               input_shape=(1, 32, 32, 1))
    step = make_train_step(model, cfg, mesh)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 1),
                              jnp.float32)
    labels = jnp.zeros((4, 12), jnp.float32)
    new_state, loss = step(state, imgs, labels)
    assert np.isfinite(float(loss))

    # the grid-sharded loss must equal the unsharded loss for the same
    # state/batch
    cfg1 = TrainConfig(**{**cfg.__dict__, "n_grid": 1})
    mesh1 = make_mesh(n_grid=1)
    step1 = make_train_step(ResNetSQ(), cfg1, mesh1)
    _, loss1 = step1(state, imgs, labels)
    # identical math; tolerance covers fp32 reduction-order differences
    # between the psum-of-partials and the single-device sum (last ulp)
    assert abs(float(loss) - float(loss1)) < 1e-6 * abs(float(loss1))


def test_train_step_dp_with_pallas():
    """Full train step on an 8-device data axis with use_pallas=True:
    the kernel runs batch-locally under shard_map (interpret mode here),
    matching the XLA-loss step's loss value."""
    cfg = TrainConfig(image_size=32, render_size=16, batch_size=8,
                      use_pallas=True, donate=False, n_grid=1)
    mesh = make_mesh(n_grid=1)
    assert dict(mesh.shape) == {"data": 8, "grid": 1}
    model = ResNetSQ()
    state = create_train_state(model, jax.random.PRNGKey(0), cfg,
                               input_shape=(1, 32, 32, 1))
    step = make_train_step(model, cfg, mesh)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 1),
                              jnp.float32)
    labels = jnp.zeros((8, 12), jnp.float32)
    with mesh:
        new_state, loss = step(state, imgs, labels)
    assert np.isfinite(float(loss))

    cfg_x = TrainConfig(**{**cfg.__dict__, "use_pallas": False})
    step_x = make_train_step(ResNetSQ(), cfg_x, mesh)
    with mesh:
        _, loss_x = step_x(state, imgs, labels)
    assert abs(float(loss) - float(loss_x)) < 1e-5 * abs(float(loss_x))
