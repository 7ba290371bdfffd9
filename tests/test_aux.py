"""Aux subsystem tests: BYOT image model, profiling timers, metrics logger."""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from ehgr_tpu.models.byot_resnet import BYOTResNet
from ehgr_tpu.utils.metrics_log import MetricsLogger
from ehgr_tpu.utils.profiling import time_fn


class TestBYOTResNet:
    def test_four_exits(self):
        model = BYOTResNet(num_class=5)
        x = jnp.zeros((2, 64, 64, 3), jnp.float32)
        v = model.init({"params": jax.random.key(0)}, x, train=False)
        out = model.apply(v, x, train=False)
        assert len(out) == 8
        for lg in out[:4]:
            assert lg.shape == (2, 5)
        for f in out[4:]:
            assert f.shape == (2, 2048)


class TestProfiling:
    def test_time_fn(self):
        f = jax.jit(lambda x: x * 2)
        stats = time_fn(f, jnp.ones((128, 128)), warmup=1, iters=3)
        assert stats["mean_ms"] > 0
        assert "p50_ms" in stats


class TestMetricsLogger:
    def test_jsonl(self, tmp_path):
        ml = MetricsLogger(str(tmp_path), enable_wandb=False)
        ml.log({"loss": 1.5, "top1": 42.0}, step=3)
        ml.log({"loss": 1.2}, step=4)
        ml.close()
        lines = [json.loads(l) for l in open(ml.path)]
        assert lines[0]["loss"] == 1.5 and lines[0]["step"] == 3
        assert len(lines) == 2


class TestFetchScalar:
    """fetch_scalar retries transient tunnel read failures (CLAUDE.md; a
    round-4 learnable probe died on one blip at the loss fetch)."""

    def test_retries_then_succeeds(self):
        import jax

        from ehgr_tpu.train.loop import fetch_scalar

        class Flaky:
            def __init__(self, fail_n):
                self.left = fail_n

            def __float__(self):
                if self.left:
                    self.left -= 1
                    raise jax.errors.JaxRuntimeError(
                        "FAILED_PRECONDITION: TPU backend error")
                return 7.5

        import time as _time
        orig = _time.sleep
        _time.sleep = lambda s: None  # no real backoff in tests
        try:
            assert fetch_scalar(Flaky(2)) == 7.5
            import pytest
            with pytest.raises(jax.errors.JaxRuntimeError):
                fetch_scalar(Flaky(3))
        finally:
            _time.sleep = orig

    def test_plain_value(self):
        from ehgr_tpu.train.loop import fetch_scalar

        assert fetch_scalar(3) == 3.0
