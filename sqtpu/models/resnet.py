"""ResNet-18 backbone + the flagship ResNetSQ regressor.

The reference's main model (``/root/reference/torch/models.py:172-204``)
is torchvision resnet18 with (a) conv1 collapsed to grayscale by summing
the RGB kernel (``:184``), (b) the fc replaced by a 512->256->256
LeakyReLU MLP, and (c) four parallel heads -> (size, shape, position,
quaternion). This is a from-scratch Flax implementation of the same
topology (NHWC), plus a weight-port entry point for torchvision
state_dicts (quirk Q14: the pretrained-weights story).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from sqtpu.models.heads import (
    PositionHead, Rotation6DHead, RotationHead, ShapeHead, SizeHead,
)


class BasicBlock(nn.Module):
    """ResNet v1 basic block (3x3 + 3x3, projection shortcut on stride)."""

    features: int
    stride: int = 1
    dtype: type = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        # explicit (1,1) padding: flax 'SAME' pads (0,1) for stride-2 3x3
        # on even sizes, while torch pads (1,1) — required for torchvision
        # weight-port parity (verified in tests/test_torch_parity.py)
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), (1, 1), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet18(nn.Module):
    """ResNet-18 feature extractor, grayscale input, global-avg-pool -> 512."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (64, 128, 256, 512)
    in_channels: int = 1  # grayscale conv1 (reference sums RGB weights)
    dtype: type = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
        for stage, (n_blocks, width) in enumerate(
            zip(self.stage_sizes, self.widths)
        ):
            for block in range(n_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = BasicBlock(width, stride, self.dtype,
                               name=f"layer{stage+1}_{block}")(x, train)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 512)


class ResNetSQ(nn.Module):
    """The flagship regressor: ResNet18 -> MLP(256,256) -> 4 heads.

    Returns ``(size, shape, position, quaternion)`` exactly like the
    reference forward (``torch/models.py:196-204``).
    """

    fcn: int = 256
    dtype: type = None
    rot6d: bool = False   # continuous 6D rotation head (Zhou et al.)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNet18(dtype=self.dtype, name="encoder")(x, train)
        h = nn.leaky_relu(nn.Dense(self.fcn, dtype=self.dtype,
                                   name="fc1")(feats), 0.01)
        h = nn.leaky_relu(nn.Dense(self.fcn, dtype=self.dtype,
                                   name="fc2")(h), 0.01)
        size = SizeHead(name="head_size")(h)
        shape = ShapeHead(name="head_shape")(h)
        position = PositionHead(name="head_position")(h)
        rot_cls = Rotation6DHead if self.rot6d else RotationHead
        rotation = rot_cls(name="head_rotation")(h)
        return size, shape, position, rotation


def params_vector(outputs) -> jnp.ndarray:
    """Concatenate the 4-tuple model output into the (B, 12) canonical
    vector (``torch/train.py:89``). Models that already emit a single
    (B, k) array (the 2019 Keras nets) pass through unchanged —
    ``jnp.concatenate`` on a bare array would flatten it row-wise."""
    if isinstance(outputs, (tuple, list)):
        return jnp.concatenate(outputs, axis=-1)
    return outputs
