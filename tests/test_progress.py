"""Chunk-level progress reporting (reference tqdm parity, VERDICT r4
item 5): enablement rules, throttling, honest totals."""
import io

import numpy as np
import pytest

from multimesh_tpu import progress as prog


def test_progress_disabled_by_default_in_batch(monkeypatch):
    monkeypatch.delenv("MMT_PROGRESS", raising=False)
    # pytest's captured stderr is not a tty -> auto-off
    assert prog.progress(100, "x", n_steps=10) is prog._NULL


def test_progress_env_force_off(monkeypatch):
    monkeypatch.setenv("MMT_PROGRESS", "0")
    assert prog.progress(100, "x", n_steps=10) is prog._NULL


def test_progress_short_loops_skipped(monkeypatch):
    monkeypatch.setenv("MMT_PROGRESS", "1")
    assert prog.progress(100, "x", n_steps=2) is prog._NULL


def test_progress_reports(monkeypatch, capsys):
    monkeypatch.setenv("MMT_PROGRESS", "1")
    p = prog.progress(1000, "locate", unit="pts", n_steps=10)
    assert isinstance(p, prog.Progress)
    with p:
        for _ in range(10):
            p.step(100)
    err = capsys.readouterr().err
    assert "locate" in err and "pts" in err
    # final line carries the total and a rate
    assert "done" in err and "1.0k pts" in err and "pts/s" in err


def test_progress_throttles(monkeypatch, capsys):
    monkeypatch.setenv("MMT_PROGRESS", "1")
    p = prog.progress(10_000, "x", n_steps=1000)
    with p:
        for _ in range(1000):
            p.step(10)
    err = capsys.readouterr().err
    # 1000 steps complete in microseconds: the 0.25 s throttle must
    # collapse them to a handful of redraws (finish + done lines)
    assert err.count("\n") <= 5


def test_progress_sync_handles_device_values(monkeypatch):
    monkeypatch.setenv("MMT_PROGRESS", "1")
    import jax.numpy as jnp

    p = prog.progress(100, "x", n_steps=5)
    with p:
        for _ in range(5):
            p.step(20, device_value=jnp.arange(4))  # must not raise
