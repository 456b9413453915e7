"""sqtpu — TPU-native superquadric recovery framework.

A ground-up JAX / XLA / Pallas re-design of the capabilities of the
``timoblak/sq-recovery`` reference (CNN regression of superquadric parameters
from single 256x256 depth images, explicit / implicit / least-squares
supervision, differentiable depth rendering, closed-loop evaluation, direct
gradient fitting).

Layer map (mirrors reference SURVEY.md layering, re-designed TPU-first):

- ``sqtpu.ops``        L3/L4/N1/N2: quaternion algebra, SQ inside-outside field,
                       differentiable depth renderers, losses & metrics,
                       fused Pallas kernels.
- ``sqtpu.models``     L5: Flax CNN regressors (ResNet18-SQ, ConvEncoder) + heads.
- ``sqtpu.data``       L1/L2: on-device synthetic data generation, BMP codec,
                       CSV label parsing, packed datasets.
- ``sqtpu.parallel``   mesh / sharding utilities (DP batch axis, grid axis).
- ``sqtpu.training``   L6: train step, LR schedules, checkpointing.
- ``sqtpu.utils``      config dataclasses, logging, profiling, NaN guards.

The canonical 12-parameter superquadric vector (reference de-facto format,
``/root/reference/torch/classes.py:132``) is::

    [a1, a2, a3, e1, e2, t1, t2, t3, qx, qy, qz, qw]

split ``(3, 2, 3, 4)``; quaternion is xyzw-ordered with w last
(``/root/reference/torch/quaternion.py:20``). Sizes and positions are
normalized by /255 into [0, 1].
"""

__version__ = "0.1.0"

from sqtpu.ops import quaternion, geometry, render, losses, metrics  # noqa: F401
