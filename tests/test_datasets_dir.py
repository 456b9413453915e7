"""Directory-dataset pipeline: generate -> pack -> DepthDataset ->
train end-to-end (the reference's primary data path: BMP dir + CSV,
``torch/classes.py:22-93`` + ``torch/train.py:24-35``)."""

import os

import numpy as np
import pytest

from sqtpu.data.datasets import DepthDataset, pack_bmp_dir
from sqtpu.data.labels import parse_csv_torch
from sqtpu.generate import GenerateConfig, generate

pytestmark = pytest.mark.slow  # heavy: excluded from -m 'not slow'


@pytest.fixture(scope="module")
def bmp_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ds") / "rot")
    generate(GenerateConfig(n=8, out=out, batch_size=4, image_size=32,
                            seed=11))
    return out


def test_pack_bmp_dir_roundtrip(bmp_dir):
    from sqtpu.data.bmp import read_bmp

    pack = pack_bmp_dir(bmp_dir)
    arr = np.load(pack, mmap_mode="r")
    assert arr.shape == (8, 32, 32) and arr.dtype == np.uint8
    np.testing.assert_array_equal(
        arr[3], read_bmp(os.path.join(bmp_dir, "000003.bmp")))
    # second call is a no-op on the existing pack
    assert pack_bmp_dir(bmp_dir) == pack


def test_depth_dataset_split_and_batches(bmp_dir):
    labels = parse_csv_torch(os.path.join(bmp_dir, "data_labels.csv"))
    ds = DepthDataset(bmp_dir, labels, train_split=0.75)
    assert len(ds) == 8
    assert len(ds.train_indices) == 6 and len(ds.val_indices) == 2
    assert not set(ds.train_indices) & set(ds.val_indices)   # no Q12 overlap

    batches = list(ds.batches(ds.train_indices, 2, shuffle=True, seed=1))
    assert len(batches) == 3
    imgs, lbls = batches[0]
    assert imgs.shape == (2, 32, 32, 1) and lbls.shape == (2, 12)
    assert imgs.dtype == np.float32 and 0.0 <= imgs.min() <= imgs.max() <= 1.0

    # drop_remainder=False keeps the tail batch
    tail = list(ds.batches(ds.train_indices, 4, drop_remainder=False))
    assert [b[0].shape[0] for b in tail] == [4, 2]

    # labels line up with images: render label i and compare to image i
    import jax.numpy as jnp
    from sqtpu.ops.render import render_depth_hard
    img0 = np.asarray(ds.images[0]).astype(np.float32) / 255.0
    re0 = np.asarray(render_depth_hard(jnp.asarray(labels[0]), 32,
                                       quantize=True, n_bisect=20))
    assert (np.abs(img0 - re0) * 255 > 1).mean() < 0.02


def test_train_from_directory_dataset(bmp_dir, tmp_path):
    """One epoch of the full training loop reading the packed BMP dir
    (the ``--data <dir> --labels-csv ...`` CLI path)."""
    from sqtpu.training.loop import train
    from sqtpu.utils.config import TrainConfig

    cfg = TrainConfig(
        model="resnet_sq", loss="param_mse", data=bmp_dir,
        labels_csv=os.path.join(bmp_dir, "data_labels.csv"),
        image_size=32, render_size=16, acc_render_size=16,
        batch_size=2, max_epochs=1, val_steps=1, train_split=0.75,
        ckpt_dir=str(tmp_path / "ckpt"), compare_images=0,
        use_pallas=False, log_interval=1)
    state, history = train(cfg)
    assert len(history["loss"]) == 1
    assert np.isfinite(history["loss"][0])
    assert np.isfinite(history["val_loss"][0])
