"""Port torchvision ResNet-18 weights into the Flax ResNetSQ encoder.

The reference depends on torchvision's ImageNet-pretrained resnet18
(``/root/reference/torch/models.py:181``) and collapses conv1 to
grayscale by summing the RGB kernel (``:184``) — SURVEY.md quirk Q14.
This module reproduces that: feed it any torchvision ``resnet18``
state_dict (as numpy arrays, or anything ``np.asarray`` accepts, e.g. a
``torch.load``-ed OrderedDict of CPU tensors) and it returns updated
Flax variables. No torch import required here.
"""

from __future__ import annotations

import numpy as np


def _conv_kernel(w) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(np.asarray(w, dtype=np.float32), (2, 3, 1, 0))


def _conv_kernel_inv(w) -> np.ndarray:
    """flax HWIO -> torch OIHW."""
    return np.transpose(np.asarray(w, dtype=np.float32), (3, 2, 0, 1))


def load_state_dict_file(path: str) -> dict:
    """Read a resnet18 state_dict from ``.npz`` (numpy archive of the
    torch key layout) or ``.pt``/``.pth`` (via torch, if installed)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch  # optional dependency, only for .pt checkpoints
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def export_torchvision_resnet18(variables: dict) -> dict:
    """Inverse of :func:`load_torchvision_resnet18`: dump the ResNetSQ
    encoder as a torchvision-resnet18-layout state_dict (numpy arrays).

    conv1 stays single-channel — :func:`load_torchvision_resnet18`'s
    grayscale ``sum(axis=1)`` is a no-op on it, so export -> load
    round-trips exactly. This is how a TPU-trained encoder becomes a
    "pretrained weights" artifact for later runs (``--pretrained``),
    format-compatible with real torchvision checkpoints.
    """
    params = variables["params"]["encoder"]
    stats = variables["batch_stats"]["encoder"]
    sd: dict = {}

    def get_bn(flax_name, torch_prefix, p=params, s=stats):
        sd[f"{torch_prefix}.weight"] = np.asarray(p[flax_name]["scale"])
        sd[f"{torch_prefix}.bias"] = np.asarray(p[flax_name]["bias"])
        sd[f"{torch_prefix}.running_mean"] = np.asarray(s[flax_name]["mean"])
        sd[f"{torch_prefix}.running_var"] = np.asarray(s[flax_name]["var"])

    sd["conv1.weight"] = _conv_kernel_inv(params["conv1"]["kernel"])
    get_bn("bn1", "bn1")
    for stage in range(1, 5):
        for block in range(2):
            bp = params[f"layer{stage}_{block}"]
            bs = stats[f"layer{stage}_{block}"]
            tp = f"layer{stage}.{block}"
            sd[f"{tp}.conv1.weight"] = _conv_kernel_inv(bp["conv1"]["kernel"])
            sd[f"{tp}.conv2.weight"] = _conv_kernel_inv(bp["conv2"]["kernel"])
            get_bn("bn1", f"{tp}.bn1", bp, bs)
            get_bn("bn2", f"{tp}.bn2", bp, bs)
            if "downsample_conv" in bp:
                sd[f"{tp}.downsample.0.weight"] = _conv_kernel_inv(
                    bp["downsample_conv"]["kernel"])
                get_bn("downsample_bn", f"{tp}.downsample.1", bp, bs)
    return sd


def load_torchvision_resnet18(variables: dict, state_dict: dict) -> dict:
    """Return a copy of ``variables`` with the encoder weights replaced.

    Args:
      variables: the full variables dict of :class:`sqtpu.models.ResNetSQ`
        (``{"params": ..., "batch_stats": ...}``).
      state_dict: torchvision resnet18 state_dict; tensor-likes are fine.

    The fc weights in the state_dict are ignored (the reference replaces
    the fc anyway, ``torch/models.py:186-189``).
    """
    import jax

    sd = {k: np.asarray(v) for k, v in state_dict.items()
          if not k.startswith("fc.")}

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    enc_p, enc_s = dict(params["encoder"]), dict(stats["encoder"])

    def put_conv(flax_name, torch_key, grayscale=False):
        w = sd[torch_key]
        if grayscale:
            w = w.sum(axis=1, keepdims=True)  # RGB -> 1ch (models.py:184)
        enc_p[flax_name] = {"kernel": _conv_kernel(w)}

    def put_bn(flax_name, torch_prefix):
        enc_p[flax_name] = {
            "scale": np.asarray(sd[f"{torch_prefix}.weight"], np.float32),
            "bias": np.asarray(sd[f"{torch_prefix}.bias"], np.float32),
        }
        enc_s[flax_name] = {
            "mean": np.asarray(sd[f"{torch_prefix}.running_mean"], np.float32),
            "var": np.asarray(sd[f"{torch_prefix}.running_var"], np.float32),
        }

    put_conv("conv1", "conv1.weight", grayscale=True)
    put_bn("bn1", "bn1")

    for stage in range(1, 5):
        for block in range(2):
            name = f"layer{stage}_{block}"
            tp = f"layer{stage}.{block}"
            blk_p = dict(enc_p[name])
            blk_s = dict(enc_s.get(name, {}))
            blk_p["conv1"] = {"kernel": _conv_kernel(sd[f"{tp}.conv1.weight"])}
            blk_p["conv2"] = {"kernel": _conv_kernel(sd[f"{tp}.conv2.weight"])}
            for bn_name, bn_key in (("bn1", f"{tp}.bn1"), ("bn2", f"{tp}.bn2")):
                blk_p[bn_name] = {
                    "scale": np.asarray(sd[f"{bn_key}.weight"], np.float32),
                    "bias": np.asarray(sd[f"{bn_key}.bias"], np.float32),
                }
                blk_s[bn_name] = {
                    "mean": np.asarray(sd[f"{bn_key}.running_mean"], np.float32),
                    "var": np.asarray(sd[f"{bn_key}.running_var"], np.float32),
                }
            if f"{tp}.downsample.0.weight" in sd:
                blk_p["downsample_conv"] = {
                    "kernel": _conv_kernel(sd[f"{tp}.downsample.0.weight"])
                }
                blk_p["downsample_bn"] = {
                    "scale": np.asarray(sd[f"{tp}.downsample.1.weight"], np.float32),
                    "bias": np.asarray(sd[f"{tp}.downsample.1.bias"], np.float32),
                }
                blk_s["downsample_bn"] = {
                    "mean": np.asarray(sd[f"{tp}.downsample.1.running_mean"], np.float32),
                    "var": np.asarray(sd[f"{tp}.downsample.1.running_var"], np.float32),
                }
            enc_p[name] = blk_p
            enc_s[name] = blk_s

    new_params = dict(params)
    new_params["encoder"] = enc_p
    new_stats = dict(stats)
    new_stats["encoder"] = enc_s
    out = dict(variables)
    out["params"] = new_params
    out["batch_stats"] = new_stats
    return out
