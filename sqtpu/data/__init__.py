"""Data pipeline: on-device synthetic generation + reference-format IO."""

from sqtpu.data.bmp import read_bmp, write_bmp  # noqa: F401
from sqtpu.data.labels import (  # noqa: F401
    parse_csv_torch, parse_csv_keras, parse_labels_txt,
)
from sqtpu.data.synthetic import make_batch, sample_params  # noqa: F401
from sqtpu.data.datasets import DepthDataset, pack_bmp_dir  # noqa: F401
