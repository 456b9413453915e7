"""Host-side datasets for pre-rendered reference data (L2 equivalent).

Replaces ``H5Dataset`` (``/root/reference/torch/classes.py:22-93``) and the
Keras ``load_dataset`` npy cache (``py/data_generators.py:38-58``):

* a directory of scanner BMPs + CSV labels is packed ONCE into a uint8
  ``.npy`` (memory-mapped thereafter — the reference's h5-reopen-per-item
  multiprocessing dance is unnecessary with a read-only memmap);
* index-based train/val split (first ``train_split`` fraction = train,
  like ``classes.py:34-45`` — but WITHOUT the shared mutable ``set_mode``
  footgun, quirk Q12: the split here returns two independent views);
* an h5py-gated reader for existing reference ``dataset.h5`` files.

The primary training path is :mod:`sqtpu.data.synthetic` (on-device
generation); this exists for parity with reference datasets.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from sqtpu.data.bmp import read_bmp


def pack_bmp_dir(image_dir: str, pack_file: str | None = None) -> str:
    """Pack all *.bmp in a directory (sorted) into one uint8 (N,256,256)
    .npy. Returns the pack path. No-op if it already exists
    (``classes.py:54-65`` semantics)."""
    pack_file = pack_file or os.path.join(image_dir, "dataset.npy")
    if os.path.exists(pack_file):
        return pack_file
    files = sorted(glob.glob(os.path.join(image_dir, "*.bmp")))
    if not files:
        raise FileNotFoundError(f"no .bmp files in {image_dir}")
    first = read_bmp(files[0])
    arr = np.lib.format.open_memmap(
        pack_file, mode="w+", dtype=np.uint8,
        shape=(len(files),) + first.shape,
    )
    arr[0] = first
    for i, f in enumerate(files[1:], start=1):
        arr[i] = read_bmp(f)
    arr.flush()
    return pack_file


def load_h5_dataset(path: str, key: str = "sq") -> np.ndarray:
    """Read a reference ``dataset.h5`` (requires h5py; gated)."""
    try:
        import h5py
    except ImportError as exc:  # pragma: no cover - env without h5py
        raise ImportError(
            "h5py is not installed; convert the data with pack_bmp_dir "
            "or install h5py to read reference dataset.h5 files"
        ) from exc
    with h5py.File(path, "r") as f:
        return np.asarray(f[key])


class DepthDataset:
    """Memory-mapped depth-image dataset with index train/val split."""

    def __init__(self, image_dir: str, labels: np.ndarray,
                 train_split: float = 0.9, pack_file: str | None = None):
        self.pack_file = pack_bmp_dir(image_dir, pack_file)
        self.images = np.load(self.pack_file, mmap_mode="r")
        self.labels = np.asarray(labels, dtype=np.float32)
        if len(self.images) != len(self.labels):
            raise ValueError(
                f"{len(self.images)} images vs {len(self.labels)} labels"
            )
        n_train = int(train_split * len(self.labels))
        self.train_indices = np.arange(n_train)
        self.val_indices = np.arange(n_train, len(self.labels))

    def __len__(self):
        return len(self.labels)

    def batches(self, indices, batch_size: int, shuffle: bool = False,
                seed: int = 0, drop_remainder: bool = True):
        """Yield (images (B,H,W,1) float32 /255, labels (B,12)) numpy
        batches. The reference DataLoader used shuffle=False (quirk Q12);
        shuffling is available and ON in our training default."""
        idx = np.array(indices)
        if shuffle:
            np.random.default_rng(seed).shuffle(idx)
        stop = len(idx) - (len(idx) % batch_size if drop_remainder else 0)
        for s in range(0, stop, batch_size):
            sel = np.sort(idx[s: s + batch_size])  # sorted for memmap locality
            imgs = self.images[sel].astype(np.float32) / 255.0
            yield imgs[..., None], self.labels[sel]
