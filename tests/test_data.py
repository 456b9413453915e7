"""Data layer tests: BMP codec, label parsing."""

import os

import numpy as np
import pytest

from sqtpu.data.bmp import read_bmp, write_bmp
from sqtpu.data.labels import (
    denormalize_torch, parse_csv_keras, parse_csv_torch, parse_labels_txt,
)

from conftest import EXAMPLES


def test_read_scanner_bmp_shape_and_range():
    img = read_bmp(os.path.join(EXAMPLES, "000000.bmp"))
    assert img.shape == (256, 256)
    assert img.dtype == np.uint8
    assert img.min() == 0  # background
    assert img.max() > 100  # object present


def test_bmp_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (256, 256), dtype=np.uint8)
    path = str(tmp_path / "rt.bmp")
    write_bmp(path, img)
    assert os.path.getsize(path) == 196662  # scanner-identical size
    np.testing.assert_array_equal(read_bmp(path), img)


def test_bmp_roundtrip_nonsquare(tmp_path):
    img = np.arange(30 * 17, dtype=np.uint8).reshape(30, 17)  # needs padding
    path = str(tmp_path / "pad.bmp")
    write_bmp(path, img)
    np.testing.assert_array_equal(read_bmp(path), img)


def test_parse_labels_txt():
    names, labels = parse_labels_txt(os.path.join(EXAMPLES, "labels.txt"))
    assert names[0] == "000000.bmp"
    assert labels.shape == (10, 12)
    # row 2 of the file = golden params
    np.testing.assert_allclose(labels[0][0], 66.231607 / 255, rtol=1e-9)
    np.testing.assert_allclose(labels[0][3], 0.380729, rtol=1e-9)
    np.testing.assert_allclose(labels[0][8], 0.935943, rtol=1e-9)


def test_csv_normalizations(tmp_path):
    csv = tmp_path / "labels.csv"
    row = ("x.bmp,50.0,60.0,70.0,0.5,0.6,100.0,128.0,150.0,"
           + ",".join(["0.0"] * 9) + ",0.1,0.2,0.3,0.9")
    csv.write_text(row + "\n")

    t = parse_csv_torch(str(csv))
    np.testing.assert_allclose(t[0, :3], [50 / 255, 60 / 255, 70 / 255], rtol=1e-6)
    np.testing.assert_allclose(t[0, 5:8], [100 / 255, 128 / 255, 150 / 255],
                               rtol=1e-6)
    np.testing.assert_allclose(t[0, 8:], [0.1, 0.2, 0.3, 0.9], rtol=1e-6)

    k = parse_csv_keras(str(csv))
    np.testing.assert_allclose(k[0, :3], [0.5, 0.7, 0.9], rtol=1e-6)
    np.testing.assert_allclose(k[0, 5:8], t[0, 5:8], rtol=1e-6)


def test_denormalize_torch():
    p = np.zeros((12,))
    p[:3] = 0.2
    p[5:8] = 0.5
    d = denormalize_torch(p)
    np.testing.assert_allclose(d[:3], 51.0)
    np.testing.assert_allclose(d[5:8], 127.5)
