"""Bulk-prediction CLI tests (batched torch/test.py equivalent)."""

import numpy as np

from sqtpu.data.labels import parse_csv_torch
from sqtpu.generate import GenerateConfig, generate
import pytest

from sqtpu.predict import (PredictConfig, list_inputs, predict_files,
                           write_csv)

pytestmark = pytest.mark.slow  # heavy: excluded from -m 'not slow'


def _make_inputs(tmp_path, n=5, size=64):
    out = str(tmp_path / "imgs")
    generate(GenerateConfig(n=n, out=out, batch_size=4, image_size=size,
                            seed=7))
    return out


def test_predict_dir_to_csv(tmp_path):
    src = _make_inputs(tmp_path)
    files = list_inputs(src)
    assert len(files) == 5 and files == sorted(files)

    # random-init model (no checkpoint on purpose): smoke the batched
    # pipeline incl. the padded tail batch (5 images, batch size 4)
    cfg = PredictConfig(inputs=src, ckpt_dir=str(tmp_path / "none"),
                        batch_size=4, image_size=64,
                        out=str(tmp_path / "pred.csv"))
    params = predict_files(cfg, files)
    assert params.shape == (5, 12)
    assert np.isfinite(params).all()
    # heads constrain the ranges: sigmoids in (0,1), unit quaternion
    assert (params[:, :8] > 0).all() and (params[:, :8] < 1).all()
    np.testing.assert_allclose(
        np.linalg.norm(params[:, 8:12], axis=-1), 1.0, atol=1e-5)

    write_csv(cfg.out, files, params)
    labels = parse_csv_torch(cfg.out)  # round-trips the ×255 convention
    np.testing.assert_allclose(labels, params, atol=1e-5)


def test_predict_csv_normalized_mode(tmp_path):
    src = _make_inputs(tmp_path, n=2)
    files = list_inputs(src)
    params = np.random.default_rng(0).uniform(
        0.1, 0.9, (2, 12)).astype(np.float32)
    params[:, 8:12] /= np.linalg.norm(params[:, 8:12], axis=-1,
                                      keepdims=True)
    out = str(tmp_path / "norm.csv")
    write_csv(out, files, params, denormalize=False)
    rows = [l.split(",") for l in open(out)]
    assert len(rows) == 2 and len(rows[0]) == 22  # fn + 21 columns
    vals = np.asarray([[float(v) for v in r[1:]] for r in rows])
    assert (vals[:, 0:3] <= 1.0).all()  # size columns stay normalized
    assert (vals[:, 5:8] <= 1.0).all()  # position columns too


def test_predict_with_input_filter_and_refine(tmp_path):
    # deployment combo: median input preprocessing + LM refinement with
    # the robustness knobs — smoke the full hardened bulk path
    src = _make_inputs(tmp_path, n=3)
    files = list_inputs(src)
    cfg = PredictConfig(inputs=src, ckpt_dir=str(tmp_path / "none"),
                        batch_size=4, image_size=64,
                        input_filter="median", refine="lm",
                        refine_steps=3, refine_size=16,
                        refine_robust_c=4.685, refine_residual="radial",
                        refine_filter="median",
                        out=str(tmp_path / "pred.csv"))
    params = predict_files(cfg, files)
    assert params.shape == (3, 12)
    assert np.isfinite(params).all()
