"""Flax CNN regressors (reference L5)."""

from sqtpu.models.encoders import ConvEncoder, MLPNeck  # noqa: F401
from sqtpu.models.heads import (  # noqa: F401
    BlockHead, PositionHead, Rotation6DHead, RotationHead, ShapeHead,
    SizeHead,
)
from sqtpu.models.nets import (  # noqa: F401
    GenericNetSQ, KerasIsoNet, KerasRotNet, KerasRotNetFixed,
)
from sqtpu.models.resnet import BasicBlock, ResNet18, ResNetSQ, params_vector  # noqa: F401
from sqtpu.models.torch_port import (  # noqa: F401
    export_torchvision_resnet18, load_state_dict_file,
    load_torchvision_resnet18,
)

import functools

from sqtpu.models.refiner import IterativeSQ, RefineBlock  # noqa: F401

MODEL_REGISTRY = {
    "resnet_sq": ResNetSQ,
    # continuous 6D rotation representation head (Zhou et al. CVPR 2019)
    "resnet_sq6d": functools.partial(ResNetSQ, rot6d=True),
    # render-and-compare iterative refinement (models/refiner.py)
    "refine_sq": IterativeSQ,
    "generic_sq": GenericNetSQ,
    "keras_iso": KerasIsoNet,
    "keras_rot": KerasRotNet,
    # 2019 architecture + the probe-justified repairs (see nets.py)
    "keras_rot_fixed": KerasRotNetFixed,
}

# parameter-vector width each model family regresses
OUTPUT_DIMS = {"resnet_sq": 12, "resnet_sq6d": 12, "refine_sq": 12,
               "generic_sq": 4, "keras_iso": 8, "keras_rot": 12,
               "keras_rot_fixed": 12}


def build_model(name: str, **kwargs):
    return MODEL_REGISTRY[name](**kwargs)
