"""bench._measure: steal-gated min-of-N semantics (no Spark involved).

Pins the two rules the round-5 bench hardening introduced:
- the reported figure is the GLOBAL min across passes (steal can only
  slow a pass, so a fast pass is honest regardless of its gate flag);
- extra passes are bought only when EVERY scheduled pass was dirty.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

import bench


def _run_measure(monkeypatch, steal_seq, time_seq, passes, max_extra=2):
    steals = iter(steal_seq)
    times = iter(time_seq)
    monkeypatch.setattr(bench, "_steal_ticks", lambda: next(steals))
    monkeypatch.setattr(bench.time, "time", lambda: next(times))
    before = dict(bench._COUNTS)
    got = bench._measure(lambda: None, passes=passes, max_extra=max_extra)
    delta = {k: bench._COUNTS[k] - before[k] for k in before}
    return got, delta


def test_global_min_keeps_fast_dirty_pass(monkeypatch):
    # pass 1: clean, 1.0 s; pass 2: heavy steal, 0.4 s — the dirty pass is
    # FASTER and must win (steal never speeds a pass up)
    got, delta = _run_measure(
        monkeypatch,
        steal_seq=[0, 0, 100, 100_000],
        time_seq=[0.0, 1.0, 10.0, 10.4],
        passes=2,
    )
    assert got == pytest.approx(0.4)
    assert delta["dirty"] == 1 and delta["extra"] == 0


def test_all_dirty_buys_extra_passes(monkeypatch):
    # both scheduled passes dirty and slow → one extra pass runs, is clean
    # and fast, and sets the result; a second extra is NOT taken
    got, delta = _run_measure(
        monkeypatch,
        steal_seq=[0, 100_000, 200_000, 300_000, 400_000, 400_010],
        time_seq=[0.0, 2.0, 10.0, 12.0, 20.0, 20.5],
        passes=2,
    )
    assert got == pytest.approx(0.5)
    assert delta["dirty"] == 2 and delta["extra"] == 1


def test_extra_passes_bounded(monkeypatch):
    # everything dirty: exactly max_extra bonus passes, min of all reported
    got, delta = _run_measure(
        monkeypatch,
        steal_seq=[0, 10**6, 2 * 10**6, 3 * 10**6,
                   4 * 10**6, 5 * 10**6, 6 * 10**6, 7 * 10**6],
        time_seq=[0.0, 3.0, 10.0, 12.5, 20.0, 21.7, 30.0, 31.9],
        passes=2, max_extra=2,
    )
    assert got == pytest.approx(1.7)
    assert delta["dirty"] == 4 and delta["extra"] == 2


def test_unreadable_steal_never_dirty(monkeypatch):
    # /proc/stat unreadable (-1): gate disabled, plain min-of-N
    got, delta = _run_measure(
        monkeypatch,
        steal_seq=[-1, -1, -1, -1],
        time_seq=[0.0, 1.2, 10.0, 10.9],
        passes=2,
    )
    assert got == pytest.approx(0.9)
    assert delta["dirty"] == 0 and delta["extra"] == 0
