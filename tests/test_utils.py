"""Unit tests for config CLI parsing, logging, NaN guard, profiling."""

import json
import os

import numpy as np
import pytest

from sqtpu.utils.config import (
    EvalConfig, FitConfig, TrainConfig, parse_cli,
)
from sqtpu.utils.logging import MetricLogger, NanGuard, Throughput


class TestParseCli:
    def test_defaults(self):
        cfg = parse_cli(TrainConfig, [])
        assert cfg == TrainConfig()

    def test_override_types(self):
        cfg = parse_cli(TrainConfig, [
            "--learning-rate", "3e-3", "--batch-size", "64",
            "--loss", "explicit", "--shuffle", "false",
            "--use-pallas", "0",
        ])
        assert cfg.learning_rate == pytest.approx(3e-3)
        assert cfg.batch_size == 64
        assert cfg.loss == "explicit"
        assert cfg.shuffle is False
        assert cfg.use_pallas is False

    def test_bool_true_spellings(self):
        for s in ("1", "true", "TRUE", "yes"):
            assert parse_cli(TrainConfig, ["--iso", s]).iso is True

    def test_eval_and_fit_configs(self):
        assert parse_cli(EvalConfig, ["--n", "5"]).n == 5
        assert parse_cli(FitConfig, ["--optimizer", "lm"]).optimizer == "lm"

    def test_unknown_flag_errors(self):
        with pytest.raises(SystemExit):
            parse_cli(TrainConfig, ["--not-a-flag", "1"])


class TestNanGuard:
    def test_warn_keeps_step(self):
        g = NanGuard("warn")
        assert g.check(float("nan")) is True
        assert g.count == 1

    def test_skip_drops_step(self):
        g = NanGuard("skip")
        assert g.check(float("nan")) is False
        assert g.check(1.0) is True
        assert g.count == 1

    def test_rejects_bad_policy(self):
        with pytest.raises(AssertionError):
            NanGuard("explode")


def test_metric_logger_jsonl(tmp_path):
    logger = MetricLogger(str(tmp_path), "run")
    logger.log(epoch=0, loss=0.5)
    logger.log(epoch=1, loss=np.float32(0.25))
    lines = [json.loads(l) for l in
             open(tmp_path / "run_metrics.jsonl").read().splitlines()]
    assert lines[0]["epoch"] == 0 and lines[0]["loss"] == 0.5
    assert lines[1]["loss"] == 0.25
    assert "t" in lines[0]


def test_throughput():
    m = Throughput()
    m.update(10)
    m.update(10)
    assert m.rate > 0
    m.reset()
    assert m.rate == 0.0


def test_step_timer():
    from sqtpu.utils.profiling import StepTimer

    t = StepTimer()
    t.start()
    dt = t.stop(fence_scalar=np.float32(1.0))
    assert dt >= 0
    assert t.median == dt


def test_plot_history_from_meta_and_jsonl(tmp_path):
    """viz.plot_history: checkpoint-dir and metrics.jsonl inputs
    (torch/helpers.py:323-327 equivalent)."""
    import json

    from sqtpu.viz import plot_history

    ckpt = tmp_path / "run"
    ckpt.mkdir()
    meta = {"epoch": 2, "history": {"loss": [1.0, 0.5, 0.25],
                                    "val_loss": [1.1, 0.6, 0.3],
                                    "val_acc": [0.5, 0.7, 0.8]}}
    (ckpt / "last.meta.json").write_text(json.dumps(meta))
    out1 = tmp_path / "curve_meta.png"
    hist = plot_history(str(ckpt), str(out1))
    assert out1.exists() and out1.stat().st_size > 1000
    assert hist["loss"] == [1.0, 0.5, 0.25]

    jsonl = tmp_path / "train_metrics.jsonl"
    with jsonl.open("w") as f:
        for i in range(3):
            f.write(json.dumps({"epoch": i, "loss": 1.0 / (i + 1),
                                "val_loss": 1.2 / (i + 1)}) + "\n")
    out2 = tmp_path / "curve_jsonl.png"
    hist2 = plot_history(str(jsonl), str(out2))
    assert out2.exists()
    assert len(hist2["loss"]) == 3
