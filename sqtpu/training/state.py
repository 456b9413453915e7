"""Flax train state with BatchNorm statistics."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class SQTrainState(train_state.TrainState):
    batch_stats: Any = None


def make_optimizer(learning_rate: float, weight_decay: float = 0.0,
                   grad_clip: float = 0.0):
    """Adam with runtime-adjustable LR (for the plateau scheduler).

    Reference: Adam(lr=1e-4, weight_decay=0) ``torch/train.py:51``.
    ``optax.inject_hyperparams`` exposes ``opt_state.hyperparams
    ['learning_rate']`` for the ReduceLROnPlateau equivalent.

    ``grad_clip`` > 0 prepends a global-norm clip INSIDE the injected
    transform (so ``hyperparams['learning_rate']`` stays where get_lr/
    set_lr expect it). The default 0 keeps the optimizer-state pytree
    identical to older checkpoints, which must keep loading.
    """
    if grad_clip:
        # the adam-vs-adamw choice must be made OUTSIDE the injected
        # function: inject_hyperparams traces its float kwargs, and a
        # Python bool() on a traced weight_decay fails at jit time
        if weight_decay:
            def _clipped(learning_rate, weight_decay):
                return optax.chain(
                    optax.clip_by_global_norm(grad_clip),
                    optax.adamw(learning_rate, weight_decay=weight_decay))
            return optax.inject_hyperparams(_clipped)(
                learning_rate=learning_rate, weight_decay=weight_decay)

        def _clipped(learning_rate):
            return optax.chain(optax.clip_by_global_norm(grad_clip),
                               optax.adam(learning_rate))
        return optax.inject_hyperparams(_clipped)(
            learning_rate=learning_rate)
    if weight_decay:
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=learning_rate, weight_decay=weight_decay
        )
    return optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)


def create_train_state(
    model, key: jax.Array, config, input_shape=None
) -> SQTrainState:
    if input_shape is None:
        input_shape = (1, config.image_size, config.image_size, 1)
    dummy = jnp.zeros(input_shape, jnp.float32)
    variables = model.init(key, dummy, train=False)
    tx = make_optimizer(config.learning_rate, config.weight_decay,
                        getattr(config, "grad_clip", 0.0))
    return SQTrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=tx,
    )


def get_lr(state: SQTrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def set_lr(state: SQTrainState, lr: float) -> SQTrainState:
    """Return a state with a new learning rate (pure update)."""
    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=state.opt_state._replace(hyperparams=hp))
