"""Native C++ scanner tests: oracle parity + ctypes batch API."""

import os
import subprocess

import numpy as np
import pytest

from sqtpu.data.bmp import read_bmp
from sqtpu.data.native import (
    ensure_built, render_batch_native, render_depth_native, write_bmp_native,
)

from conftest import EXAMPLES

pytestmark = pytest.mark.slow  # heavy: excluded from -m 'not slow'

NATIVE_CLI = os.path.join(os.path.dirname(__file__), "..", "native", "sqscan")


@pytest.fixture(scope="module", autouse=True)
def built():
    ensure_built()


def test_cli_matches_reference_scanner(tmp_path, example_labels):
    """Our C++ CLI must reproduce the shipped scanner's BMP byte-for-byte
    (tolerating the <0.1% silhouette-edge pixels)."""
    names, labels = example_labels
    import jax.numpy as jnp
    from sqtpu.ops import quaternion as quat

    total_bad, total = 0, 0
    for i, nm in enumerate(names[:5]):
        p = labels[i]
        q = p[8:12] / np.linalg.norm(p[8:12])
        M = np.asarray(quat.to_matrix(jnp.asarray(q)))
        out = str(tmp_path / f"n{i}.bmp")
        args = [NATIVE_CLI, out] + ["%f" % v for v in np.concatenate(
            [p[0:3] * 255, p[3:5], p[5:8] * 255, M.ravel()])]
        subprocess.run(args, check=True)
        ours = read_bmp(out).astype(int)
        ref = read_bmp(os.path.join(EXAMPLES, nm)).astype(int)
        assert os.path.getsize(out) == 196662
        total_bad += int((np.abs(ours - ref) > 1).sum())
        total += ours.size
    assert total_bad / total < 1e-3


def test_native_matches_jax_renderer(example_labels):
    """C++ and Pallas/JAX hard renderers implement the same algorithm —
    outputs must agree."""
    import jax.numpy as jnp
    from sqtpu.ops.render import render_depth_hard

    _, labels = example_labels
    p = labels[0]
    native = render_depth_native(p, 256, n_bisect=30).astype(int)
    jaxed = (np.asarray(render_depth_hard(
        jnp.asarray(p), 256, n_bisect=30, quantize=True)) * 255).astype(int)
    assert (np.abs(native - jaxed) > 1).mean() < 1e-4


def test_batch_render(example_labels):
    _, labels = example_labels
    batch = render_batch_native(labels[:4], size=128)
    assert batch.shape == (4, 128, 128)
    assert batch.dtype == np.uint8
    assert all(b.max() > 50 for b in batch)  # objects rendered


def test_native_bmp_writer_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    path = str(tmp_path / "nat.bmp")
    write_bmp_native(path, img)
    np.testing.assert_array_equal(read_bmp(path), img)


def test_cli_usage_error():
    proc = subprocess.run([NATIVE_CLI, "too", "few"], capture_output=True)
    assert proc.returncode != 0
    assert b"usage" in proc.stderr
