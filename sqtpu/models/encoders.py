"""Convolutional encoders (reference L5).

Two encoder families exist in the reference:

* the 13-conv VGG-ish stack used by BOTH generations — torch
  ``GenericNetSQ`` (``torch/models.py:125-169``, LeakyReLU) and the Keras
  ``cbr`` builder (``py/models.py:9-54``, ReLU). Here one
  :class:`ConvEncoder` covers both via the activation knob.
* torchvision ResNet-18 (see :mod:`sqtpu.models.resnet`).

Layout is NHWC (TPU-native; XLA tiles convs onto the MXU best in
channels-last). Inputs are (B, 256, 256, 1) depth images in [0, 1].
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn


class ConvEncoder(nn.Module):
    """13-block Conv+BN+activation stack, 5 stride-2 stages, 256x256 -> 8x8.

    Channel plan (32, 32, 32, 32, 64, 64, 64, 128, 128, 128, 256, 256, 256)
    with stride 2 on blocks 0, 3, 6, 9, 12 and a 7x7 stem — exactly the
    reference topology (``torch/models.py:134-152``; ``py/models.py:19-40``).

    Padding note: 'SAME' here matches the KERAS generation's
    ``padding="same"`` semantics (asymmetric (0,1) pads on stride-2
    layers). The torch ``GenericNetSQ`` pads (1,1); since no pretrained
    GenericNet weights exist to port, the keras convention is used for
    both. (ResNetSQ, which DOES port torchvision weights, uses explicit
    torch-style padding — see resnet.py.)
    """

    activation: str = "leaky_relu"  # "leaky_relu" (torch) | "relu" (keras)
    widths: Sequence[int] = (32, 32, 32, 32, 64, 64, 64, 128, 128, 128,
                             256, 256, 256)
    dtype: type = None

    def _act(self, x):
        if self.activation == "leaky_relu":
            return nn.leaky_relu(x, 0.01)
        return nn.relu(x)

    @nn.compact
    def __call__(self, x, train: bool = False):
        strided = {0, 3, 6, 9, 12}
        for i, w in enumerate(self.widths):
            kernel = (7, 7) if i == 0 else (3, 3)
            stride = (2, 2) if i in strided else (1, 1)
            x = nn.Conv(w, kernel, stride, padding="SAME", use_bias=True,
                        dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype)(x)
            x = self._act(x)
        return x  # (B, 8, 8, 256)


class MLPNeck(nn.Module):
    """Flatten + 2x Dense+LeakyReLU (``torch/models.py:154-157, 186-189``)."""

    features: int = 256
    dtype: type = None

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = nn.leaky_relu(nn.Dense(self.features, dtype=self.dtype)(x), 0.01)
        x = nn.leaky_relu(nn.Dense(self.features, dtype=self.dtype)(x), 0.01)
        return x
