"""Complete model assemblies for both reference generations."""

from __future__ import annotations

import flax.linen as nn

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
