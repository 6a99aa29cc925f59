"""Coverage for the small utility subsystems: scalar logging, profiling
timers, and the compile-cache switch."""

import json
import os

from rgcn_tpu.utils.logging import ScalarLogger
from rgcn_tpu.utils.profiling import StepTimer


def test_scalar_logger_jsonl(tmp_path):
    log = ScalarLogger(run_dir=str(tmp_path), verbose=False)
    log.log_scalar("training.loss", 1.5, step=1)
    log.log_scalar("test.accuracy", 92.0, step=1)
    log.close()
    path = os.path.join(str(tmp_path), "metrics.jsonl")
    rows = [json.loads(l) for l in open(path)]
    assert [r["metric"] for r in rows] == ["training.loss", "test.accuracy"]
    assert rows[0]["value"] == 1.5 and rows[0]["step"] == 1


def test_scalar_logger_no_dir():
    log = ScalarLogger(verbose=False)
    log.log_scalar("x", 1.0)  # no run_dir: must not raise
    log.close()


def test_step_timer():
    timer = StepTimer(edges_per_step=1000, warmup=1)
    import time

    for _ in range(4):
        with timer:
            time.sleep(0.002)
    assert timer.steps == 4
    assert timer.mean_s() >= 0.002
    assert timer.edges_per_s() > 0
    assert "edges/s" in timer.summary()


def test_compile_cache_idempotent(monkeypatch, tmp_path):
    import rgcn_tpu.utils.compile_cache as cc

    monkeypatch.setattr(cc, "_enabled", False)
    cc.enable(str(tmp_path / "cache"))
    import jax

    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cache")
    cc.enable("/elsewhere")  # second call is a no-op
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cache")
