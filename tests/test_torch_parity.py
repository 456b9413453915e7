"""Numerical parity of the Flax ResNet-18 vs a torch implementation.

torchvision is not installed, but torch (CPU) is: this builds resnet18
with torchvision's exact topology/state_dict layout in plain torch,
initializes it randomly, ports the state_dict through
``load_torchvision_resnet18``, and requires the two frameworks to agree
on the forward activations — validating both the architecture port and
the weight converter end to end (quirk Q14).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sqtpu.models import ResNetSQ, load_torchvision_resnet18  # noqa: E402

pytestmark = pytest.mark.slow  # heavy: excluded from -m 'not slow'


class _BasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idt)


class _TorchResNet18(tnn.Module):
    """torchvision.models.resnet18 topology with identical state_dict keys."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        widths = [64, 128, 256, 512]
        for s, w in enumerate(widths, start=1):
            cin = widths[max(s - 2, 0)]
            layer = tnn.Sequential(
                _BasicBlock(cin, w, stride=1 if s == 1 else 2),
                _BasicBlock(w, w, stride=1),
            )
            setattr(self, f"layer{s}", layer)
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc = tnn.Linear(512, 1000)

    def forward_features(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for s in range(1, 5):
            x = getattr(self, f"layer{s}")(x)
        return self.avgpool(x).flatten(1)


def _fix_keys(sd):
    """torch Sequential names blocks '0'/'1'; torchvision layout is
    layerN.B.{...} and downsample.{0,1} — our Sequential already matches."""
    return {k: v.detach().numpy() for k, v in sd.items()}


def test_ported_resnet_matches_torch_forward():
    torch.manual_seed(0)
    tmodel = _TorchResNet18().eval()
    # randomize BN stats too, so the test covers running-stat porting
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    model = ResNetSQ()
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ported = load_torchvision_resnet18(variables, _fix_keys(tmodel.state_dict()))

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32)

    # torch side: grayscale conv1 is emulated by feeding the SAME image to
    # all 3 RGB channels (sum over RGB kernels == grayscale-kernel conv)
    timg = torch.from_numpy(np.repeat(img.transpose(0, 3, 1, 2), 3, axis=1))
    with torch.no_grad():
        feats_t = tmodel.forward_features(timg).numpy()

    # flax side: run just the encoder on the grayscale image
    from sqtpu.models.resnet import ResNet18

    enc = ResNet18()
    enc_vars = {"params": ported["params"]["encoder"],
                "batch_stats": ported["batch_stats"]["encoder"]}
    feats_j = np.asarray(enc.apply(enc_vars, jnp.asarray(img), train=False))

    np.testing.assert_allclose(feats_j, feats_t, rtol=2e-4, atol=2e-5)


def test_export_load_roundtrip_and_pretrained_training(tmp_path):
    """export_torchvision_resnet18 -> .npz -> --pretrained training run:
    the full 'pretrained encoder' path exercised end to end (VERDICT
    round 1, missing #2). The exported layout must round-trip exactly and
    the loop must train from it."""
    from sqtpu.models import export_torchvision_resnet18
    from sqtpu.training.loop import train
    from sqtpu.utils.config import TrainConfig

    model = ResNetSQ()
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(7), x, train=False)
    sd = export_torchvision_resnet18(variables)
    assert "layer4.1.bn2.running_var" in sd and "conv1.weight" in sd
    assert sd["conv1.weight"].shape == (64, 1, 7, 7)
    path = tmp_path / "encoder.npz"
    np.savez(path, **sd)

    # round-trip: load back into a DIFFERENTLY-initialized model
    variables2 = model.init(jax.random.PRNGKey(8), x, train=False)
    restored = load_torchvision_resnet18(
        variables2, {k: np.load(path)[k] for k in np.load(path).files})
    for a, b in zip(
            jax.tree_util.tree_leaves(restored["params"]["encoder"]),
            jax.tree_util.tree_leaves(variables["params"]["encoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cfg = TrainConfig(
        model="resnet_sq", loss="supervised_sym", image_size=32,
        render_size=16, batch_size=4, max_epochs=1, steps_per_epoch=2,
        val_steps=1, synthetic_size=8, pretrained=str(path),
        ckpt_dir=str(tmp_path / "ckpt"), use_pallas=False,
        compare_images=1, data_cache=False)
    state, history = train(cfg)
    assert np.isfinite(history["loss"][-1])
    # epoch-0 compare pairs written (train.py:148-151 parity)
    assert (tmp_path / "ckpt" / "compare" / "0_true.bmp").exists()
    assert (tmp_path / "ckpt" / "compare" / "0_pred.bmp").exists()
