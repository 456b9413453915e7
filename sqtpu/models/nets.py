"""Complete model assemblies for both reference generations."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sqtpu.models.encoders import ConvEncoder, MLPNeck
from sqtpu.models.heads import RotationHead


class GenericNetSQ(nn.Module):
    """From-scratch VGG-ish encoder -> MLP -> RotationHead.

    The reference's rotation-only experiment model
    (``/root/reference/torch/models.py:125-169``).
    """

    fcn: int = 256
    dtype: type = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvEncoder(activation="leaky_relu", dtype=self.dtype,
                        name="encoder")(x, train)
        x = MLPNeck(self.fcn, dtype=self.dtype, name="neck")(x)
        return RotationHead(name="head_rotation")(x)


class KerasIsoNet(nn.Module):
    """2019 isometry regressor: 13-conv ReLU encoder -> Flatten -> Dense(8).

    Equivalent of ``py/models.py:get_model`` (``:19-54``), trained with
    plain MSE on the 8 normalized parameters.
    """

    outputs: int = 8
    dtype: type = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvEncoder(activation="relu", dtype=self.dtype,
                        name="encoder")(x, train)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.outputs, dtype=self.dtype, name="out")(x)


class KerasRotNetFixed(nn.Module):
    """The 2019 rotation architecture with the repairs the landscape
    probe justifies: bounded block activations and a unit quaternion.

    ``tools/probe_keras2019.py`` shows the 2019 occupancy-field MSE
    (``py/loss_functions.py:91-101``) has near-zero minima at WRONG
    rotations beyond ~0.9 rad offset — no head can learn rotation
    through it, so the fix is the objective, not more capacity. This
    model keeps the 2019 encoder stack (13-conv ReLU ->
    Flatten -> Dense(12), Q8-fixed) and adds only what the repaired
    objective (the 2020 explicit loss) assumes of its input: sigmoid on
    size/shape/position (``torch/models.py:33-99`` head convention) and
    an L2-normalized quaternion (``:22-30``). Train with
    ``--model keras_rot_fixed --loss explicit --grad-clip 1.0``.

    The output Dense starts NEUTRAL: small-variance kernel and a bias of
    (0…0, 0,0,0,1) — sigmoid(0) = 0.5 mid-range blocks, identity
    quaternion. A default-init Dense(12) under the ×100-scaled explicit
    gradients saturates the sigmoids within the first epoch (a → 0,
    e → 1: the shrink-to-sliver spurious minimum of occupancy MSE, an
    EMPTY prediction with a flat loss — runs/krf_train.log stalled there
    for 90 epochs with closed-loop IoU exactly 0). Starting at the mean
    shape with bounded early steps (--grad-clip) keeps the surface band
    informative from step 0, which is the regime the capture-range probe
    (tools/probe_keras2019.py) proves convergent.
    """

    outputs: int = 12
    dtype: type = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvEncoder(activation="relu", dtype=self.dtype,
                        name="encoder")(x, train)
        x = x.reshape(x.shape[0], -1)

        def _neutral_bias(key, shape, dtype=jnp.float32):
            b = jnp.zeros(shape, dtype)
            return b.at[-1].set(1.0)  # identity quaternion (xyzw)

        raw = nn.Dense(
            self.outputs, dtype=self.dtype, name="out",
            kernel_init=nn.initializers.variance_scaling(
                0.01, "fan_in", "truncated_normal"),
            bias_init=_neutral_bias)(x)
        blocks = nn.sigmoid(raw[..., :8])
        q = raw[..., 8:12]
        # NaN-safe normalize (see heads.RotationHead for the 0-logit case)
        sumsq = jnp.sum(q * q, axis=-1, keepdims=True)
        q = q * jax.lax.rsqrt(jnp.maximum(sumsq, jnp.asarray(1e-6, q.dtype)))
        return jnp.concatenate([blocks, q], axis=-1)


class KerasRotNet(nn.Module):
    """2019 rotation regressor: encoder -> Flatten -> Dense(12).

    ``py/models.py:get_model_rot`` (``:57-85``) forgot the Flatten before
    its Dense (latent bug, SURVEY.md quirk Q8 — Dense applied per 8x8
    spatial cell). Implemented here with the evidently-intended Flatten.
    """

    outputs: int = 12
    dtype: type = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvEncoder(activation="relu", dtype=self.dtype,
                        name="encoder")(x, train)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.outputs, dtype=self.dtype, name="out")(x)
