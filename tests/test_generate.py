"""Dataset-generation CLI tests (gen_rand_rot/iso equivalents)."""

import os

import numpy as np
import pytest

from sqtpu.data.bmp import read_bmp
from sqtpu.data.labels import parse_csv_torch
from sqtpu.generate import GenerateConfig, generate

pytestmark = pytest.mark.slow  # heavy: excluded from -m 'not slow'


def test_generate_rot_dataset(tmp_path):
    cfg = GenerateConfig(n=6, out=str(tmp_path / "rot"), batch_size=4,
                         image_size=64, seed=3)
    generate(cfg)
    files = sorted(os.listdir(tmp_path / "rot"))
    assert "data_labels.csv" in files
    bmps = [f for f in files if f.endswith(".bmp")]
    assert bmps == ["%06d.bmp" % i for i in range(6)]

    # CSV is reference-format: parseable by the torch-normalization parser
    labels = parse_csv_torch(str(tmp_path / "rot" / "data_labels.csv"))
    assert labels.shape == (6, 12)
    assert labels[:, 0:3].min() >= 25 / 255 - 1e-6
    np.testing.assert_allclose(
        np.linalg.norm(labels[:, 8:12], axis=-1), 1.0, atol=1e-5)

    img = read_bmp(str(tmp_path / "rot" / "000000.bmp"))
    assert img.shape == (64, 64)
    assert img.max() > 50  # object present


def test_generate_iso_fixed_quaternion(tmp_path):
    cfg = GenerateConfig(n=2, out=str(tmp_path / "iso"), batch_size=2,
                         image_size=32, iso=True)
    generate(cfg)
    labels = parse_csv_torch(str(tmp_path / "iso" / "data_labels.csv"))
    np.testing.assert_allclose(
        labels[:, 8:12],
        np.tile(np.array([1, 1, 1, 0]) / np.sqrt(3), (2, 1)), atol=1e-5)


def test_generate_native_backend(tmp_path):
    cfg = GenerateConfig(n=2, out=str(tmp_path / "nat"), batch_size=2,
                         image_size=64, backend="native")
    generate(cfg)
    img = read_bmp(str(tmp_path / "nat" / "000000.bmp"))
    assert img.shape == (64, 64) and img.max() > 50
