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
