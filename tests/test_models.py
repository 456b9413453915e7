"""Model tests: shapes, output ranges, param counts, weight port."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqtpu.models import (
    GenericNetSQ, KerasIsoNet, ResNetSQ, build_model, params_vector,
    load_torchvision_resnet18,
)

pytestmark = pytest.mark.slow  # heavy: excluded from -m 'not slow'


@pytest.fixture(scope="module")
def resnet_vars():
    model = ResNetSQ()
    x = jax.random.uniform(jax.random.PRNGKey(9), (2, 64, 64, 1), jnp.float32)
    return model, model.init(jax.random.PRNGKey(0), x, train=False), x


def test_resnet_sq_output_contract(resnet_vars):
    model, variables, x = resnet_vars
    size, shape, pos, rot = model.apply(variables, x, train=False)
    assert size.shape == (2, 3) and shape.shape == (2, 2)
    assert pos.shape == (2, 3) and rot.shape == (2, 4)
    # sigmoid heads in (0, 1)
    for arr in (size, shape, pos):
        a = np.asarray(arr)
        assert np.all(a > 0) and np.all(a < 1)
    # unit quaternion
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rot), axis=-1), 1.0, atol=1e-5
    )
    v = params_vector((size, shape, pos, rot))
    assert v.shape == (2, 12)


def test_resnet18_param_count(resnet_vars):
    """Encoder ≈ torchvision resnet18 conv trunk (11.18M sans fc)."""
    _, variables, _ = resnet_vars
    enc = variables["params"]["encoder"]
    n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(enc))
    # torchvision resnet18 has 11,176,512 non-fc params for 3-ch conv1;
    # grayscale conv1 removes 64*2*49 = 6,272.
    assert n == 11_176_512 - 6_272


def test_batchnorm_train_mode_updates_stats(resnet_vars):
    model, variables, x = resnet_vars
    _, mutated = model.apply(
        variables, jnp.ones_like(x), train=True, mutable=["batch_stats"]
    )
    before = variables["batch_stats"]["encoder"]["bn1"]["mean"]
    after = mutated["batch_stats"]["encoder"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_generic_net_rotation_only():
    model = GenericNetSQ()
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 256, 256, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    q = model.apply(variables, x, train=False)
    assert q.shape == (1, 4)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q)), 1.0, atol=1e-5)


def test_keras_iso_net():
    model = KerasIsoNet(outputs=8)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 256, 256, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 8)


def test_registry():
    assert isinstance(build_model("resnet_sq"), ResNetSQ)


def test_torchvision_weight_port():
    """Round-trip a synthetic torchvision-layout state_dict."""
    model = ResNetSQ()
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), x, train=False)

    rng = np.random.default_rng(0)
    sd = {"conv1.weight": rng.normal(size=(64, 3, 7, 7)).astype(np.float32)}
    for k in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{k}"] = rng.normal(size=(64,)).astype(np.float32)
    widths = [64, 128, 256, 512]
    for stage in range(1, 5):
        w = widths[stage - 1]
        w_in = widths[max(stage - 2, 0)]
        for block in range(2):
            cin = w_in if block == 0 else w
            tp = f"layer{stage}.{block}"
            sd[f"{tp}.conv1.weight"] = rng.normal(size=(w, cin, 3, 3)).astype(np.float32)
            sd[f"{tp}.conv2.weight"] = rng.normal(size=(w, w, 3, 3)).astype(np.float32)
            for bn in ("bn1", "bn2"):
                for k in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{tp}.{bn}.{k}"] = rng.normal(size=(w,)).astype(np.float32)
            if stage > 1 and block == 0:
                sd[f"{tp}.downsample.0.weight"] = rng.normal(
                    size=(w, cin, 1, 1)).astype(np.float32)
                for k in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{tp}.downsample.1.{k}"] = rng.normal(size=(w,)).astype(np.float32)
    sd["fc.weight"] = rng.normal(size=(1000, 512)).astype(np.float32)

    ported = load_torchvision_resnet18(variables, sd)
    # conv1 must be the grayscale sum, transposed to HWIO
    expect = np.transpose(sd["conv1.weight"].sum(1, keepdims=True), (2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(ported["params"]["encoder"]["conv1"]["kernel"]), expect
    )
    # a deep block kernel landed where it should
    np.testing.assert_allclose(
        np.asarray(ported["params"]["encoder"]["layer4_0"]["downsample_conv"]["kernel"]),
        np.transpose(sd["layer4.0.downsample.0.weight"], (2, 3, 1, 0)),
    )
    # ported model still runs
    out = model.apply(ported, x, train=False)
    assert params_vector(out).shape == (1, 12)


def test_rotation_6d_head():
    """resnet_sq6d: continuous 6D rotation rep (Zhou et al.) -> unit
    xyzw quaternion; finite value+grad at zero logits (identity rot)."""
    import jax
    import jax.numpy as jnp
    from sqtpu.models import build_model, params_vector
    from sqtpu.models.heads import Rotation6DHead
    from sqtpu.ops import quaternion as quat

    m = build_model("resnet_sq6d")
    x = jnp.zeros((2, 64, 64, 1), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = params_vector(m.apply(v, x, train=False))
    assert out.shape == (2, 12)
    q = out[:, 8:12]
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1),
                               1.0, atol=1e-5)
    # the quaternion corresponds to an orthonormal rotation matrix
    rot = np.asarray(quat.to_matrix(q))
    np.testing.assert_allclose(rot @ np.transpose(rot, (0, 2, 1)),
                               np.broadcast_to(np.eye(3), (2, 3, 3)),
                               atol=1e-5)
    assert np.linalg.det(rot[0]) > 0.5  # proper rotation, not reflection

    # head alone: zero logits -> identity rotation, finite gradient
    head = Rotation6DHead()
    hv = head.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)))
    hv = jax.tree_util.tree_map(jnp.zeros_like, hv)  # force zero logits
    q0 = head.apply(hv, jnp.zeros((1, 16)))
    np.testing.assert_allclose(np.asarray(q0), [[0, 0, 0, 1]], atol=1e-6)
    g = jax.grad(lambda p, xx: jnp.sum(head.apply(p, xx) ** 2))(
        hv, jnp.ones((1, 16)))
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))
