"""Observability utilities: MetricsWriter/StepTimer (utils/logging.py) and
the profiling helpers (utils/profiling.py).

The reference's observability is a per-iteration SummaryWriter + train.log
(/root/reference/train_STEP1.py:77,250-277); these utilities back the
training loops (train/loop.py, train/vocoder_loop.py) and every benchmark's
materializing timer."""

import os
import re

import jax.numpy as jnp
import numpy as np

from unitspeech_tpu.utils.logging import MetricsWriter, StepTimer, get_logger
from unitspeech_tpu.utils.profiling import annotate, materialize, timed


def test_metrics_writer_train_log(tmp_path):
    w = MetricsWriter(str(tmp_path / "run"), enable_tensorboard=False)
    w.scalars({"loss": 1.25}, step=3)  # no-op without TB, must not raise
    w.log_line("hello")
    w.epoch_summary(2, {"dur_loss": 0.5, "diff_loss": 1.0})
    w.close()
    text = open(os.path.join(w.log_dir, "train.log"), encoding="utf-8").read()
    lines = text.strip().split("\n")
    assert lines[0] == "hello"
    # reference-style per-epoch line: "Epoch N: k: v | k: v"
    assert re.fullmatch(
        r"Epoch 2: dur_loss: 0\.500000 \| diff_loss: 1\.000000", lines[1]
    )
    assert w.elapsed() >= 0.0


def test_step_timer_ema():
    t = StepTimer(alpha=0.5)
    assert t.tick() is None  # first tick has no interval yet
    e1 = t.tick()
    e2 = t.tick()
    assert e1 is not None and e2 is not None and e1 > 0 and e2 > 0


def test_get_logger_idempotent_handlers():
    a = get_logger("unitspeech_tpu.test_obs")
    b = get_logger("unitspeech_tpu.test_obs")
    assert a is b and len(a.handlers) == 1


def test_materialize_and_timed():
    tree = {"a": jnp.arange(4), "b": (jnp.ones((2, 2)),)}
    host = materialize(tree)
    assert isinstance(host["a"], np.ndarray)
    assert isinstance(host["b"][0], np.ndarray)

    calls = []

    def fn(x):
        calls.append(1)
        return x * 2

    med, stats = timed(fn, jnp.ones((8,)), repeats=3, warmup=1)
    assert len(calls) == 4  # warmup + repeats
    assert med >= 0 and stats["repeats"] == 3
    assert stats["min_s"] <= stats["median_s"] <= stats["max_s"]

    with annotate("region"):  # must nest without error on any backend
        pass
