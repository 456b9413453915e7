"""Label parsing for the reference CSV / labels.txt formats.

The 21-value CSV row is ``fn, a1..a3, e1, e2, t1..t3, m11..m33, q1..q4``
(``/root/reference/data/generation_scripts/gen_rand_rot.py:36-39``). Two
incompatible normalizations exist in the reference (SURVEY.md quirk Q10);
both are provided:

* torch: a/255, t/255 (``torch/helpers.py:188-218``) -> 12-vector
  [a, e, t, q].
* keras: (a−25)/50, t/255 (``py/data_generators.py:14-35``) -> the
  12 normalized values in the same order.
"""

from __future__ import annotations

import numpy as np


def _rows(path: str, skip_header: bool) -> list[list[str]]:
    with open(path, "r") as f:
        lines = [ln for ln in f.read().split("\n") if ln]
    if skip_header and lines and not _is_float(lines[0].split(",")[1]):
        lines = lines[1:]
    return [ln.split(",") for ln in lines]


def _is_float(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def parse_csv_torch(path: str, dtype=np.float32) -> np.ndarray:
    """(N, 12) float labels with torch normalization (a/255, e, t/255, q).

    Equivalent to ``torch/helpers.py:parse_csv`` (truncated to the
    12-vector the datasets actually consume, ``classes.py:90-93``).
    """
    out = []
    for cols in _rows(path, skip_header=True):
        vals = [float(v) for v in cols[1:9]]  # a1..a3, e1, e2, t1..t3
        a = [v / 255.0 for v in vals[0:3]]
        e = vals[3:5]
        t = [v / 255.0 for v in vals[5:8]]
        q = [float(v) for v in cols[-4:]]
        out.append(a + e + t + q)
    return np.asarray(out, dtype=dtype)


def parse_csv_keras(path: str, dtype=np.float32) -> np.ndarray:
    """(N, 12) float labels with keras normalization ((a−25)/50, e, t/255, q).

    Equivalent to ``py/data_generators.py:parse_csv`` (sans filename col).
    """
    out = []
    for cols in _rows(path, skip_header=True):
        vals = [float(v) for v in cols[1:9]]
        a = [(v - 25.0) / 50.0 for v in vals[0:3]]
        e = vals[3:5]
        t = [v / 255.0 for v in vals[5:8]]
        q = [float(v) for v in cols[-4:]]
        out.append(a + e + t + q)
    return np.asarray(out, dtype=dtype)


def parse_labels_txt(path: str, dtype=np.float64) -> tuple[list[str], np.ndarray]:
    """Parse the example ``labels.txt`` (header + 21 cols + filename).

    Returns (filenames, (N, 12) torch-normalized params) — the format of
    ``/root/reference/data/example_imgs/labels.txt``.
    """
    names, out = [], []
    for cols in _rows(path, skip_header=True):
        names.append(cols[0])
        vals = [float(v) for v in cols[1:9]]
        a = [v / 255.0 for v in vals[0:3]]
        e = vals[3:5]
        t = [v / 255.0 for v in vals[5:8]]
        q = [float(v) for v in cols[-4:]]
        out.append(a + e + t + q)
    return names, np.asarray(out, dtype=dtype)


def denormalize_torch(p: np.ndarray) -> np.ndarray:
    """[a·255, e, t·255, q] — the de-normalization printed by
    ``torch/test.py:40-44``."""
    p = np.asarray(p)
    out = p.copy()
    out[..., 0:3] = p[..., 0:3] * 255.0
    out[..., 5:8] = p[..., 5:8] * 255.0
    return out
