"""bench.py lever-autotune logic: subprocess orchestration is stubbed so
the parse / combine / budget rules are exercised without TPU time."""

import importlib.util
import sys
import time

import pytest


def _deadline(seconds=3600.0):
    """A generous future deadline — these tests exercise parse/combine
    rules, never the budget cutoff (which has its own test)."""
    return time.monotonic() + seconds


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench_mod", "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


class _Result:
    def __init__(self, value):
        self.stdout = f"warmup noise\nONECONF_RESULT {value:.4f}\n"
        self.stderr = ""  # capture_output=True always provides one
        self.returncode = 0


def _patch_run(monkeypatch, values, calls):
    import subprocess

    def fake_run(cmd, capture_output, text, timeout, env):
        conf = env["BENCH_ONECONF"]
        calls.append(conf)
        b, unroll, remat, fusebn, fusedblk = conf.split(",")
        key = (remat, fusebn, fusedblk)
        return _Result(values[key])

    monkeypatch.setattr(subprocess, "run", fake_run)


def test_probe_levers_returns_best_and_combines(bench, monkeypatch):
    """fusedblk and remat:mid both beat base -> the combined config is
    queued and its value can win."""
    calls = []
    values = {
        ("all", "0", "0"): 98.0,    # layout:off (loses to the on-default)
        ("all", "0", "1"): 120.0,   # fusedblk
        ("mid", "0", "0"): 115.0,   # remat:mid
        ("all", "1", "0"): 90.0,    # fusebn (loses)
        ("mid", "0", "1"): 140.0,   # fusedblk+mid
    }
    _patch_run(monkeypatch, values, calls)
    monkeypatch.delenv("BENCH_AUTOTUNE", raising=False)
    best = bench._probe_levers(8, 100.0, _deadline())
    assert best == 140.0
    # combo inserted immediately after remat:mid, before fusebn
    assert [c.split(",")[2:] for c in calls] == [
        ["all", "0", "0"], ["all", "0", "1"], ["mid", "0", "0"],
        ["mid", "0", "1"], ["all", "1", "0"],
    ]
    assert all(c.startswith("8,0,") for c in calls)


def test_probe_levers_no_combo_when_a_lever_loses(bench, monkeypatch):
    calls = []
    values = {
        ("all", "0", "0"): 99.0,    # layout:off
        ("all", "0", "1"): 120.0,   # fusedblk wins
        ("mid", "0", "0"): 80.0,    # remat:mid loses -> no combo
        ("all", "1", "0"): 95.0,
    }
    _patch_run(monkeypatch, values, calls)
    monkeypatch.delenv("BENCH_AUTOTUNE", raising=False)
    best = bench._probe_levers(8, 100.0, _deadline())
    assert best == 120.0
    assert len(calls) == 4


def test_probe_levers_disabled(bench, monkeypatch):
    monkeypatch.setenv("BENCH_AUTOTUNE", "0")
    assert bench._probe_levers(8, 100.0, _deadline()) == 100.0


def test_probe_levers_expired_deadline_runs_nothing(bench, monkeypatch):
    """A deadline already in the past (the global BENCH_DEADLINE_S gate)
    must skip every probe and return the base value untouched."""
    calls = []
    _patch_run(monkeypatch, {}, calls)
    monkeypatch.delenv("BENCH_AUTOTUNE", raising=False)
    assert bench._probe_levers(8, 100.0, _deadline(0)) == 100.0
    assert calls == []


def test_probe_levers_survives_failed_child(bench, monkeypatch):
    """A child with no ONECONF_RESULT line (crash) contributes 0 and the
    loop continues."""
    import subprocess

    calls = []

    def fake_run(cmd, capture_output, text, timeout, env):
        calls.append(env["BENCH_ONECONF"])
        r = _Result(0.0)
        r.stdout = ""
        r.stderr = "Traceback (most recent call last): boom\n"
        r.returncode = 1
        return r

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.delenv("BENCH_AUTOTUNE", raising=False)
    monkeypatch.delenv("BENCH_AUTOTUNE_BUDGET_S", raising=False)
    assert bench._probe_levers(8, 100.0, _deadline()) == 100.0
    assert len(calls) == 4


def test_measure_full_depth_sets_env_and_parses(bench, monkeypatch):
    """The full-depth extra row runs one B=8 child with BENCH_DEPTH=full
    (B=16 is excluded by the measured memory ladder) and returns its
    parsed value; it never competes with the pruned headline."""
    import subprocess

    seen = []

    def fake_run(cmd, capture_output, text, timeout, env):
        seen.append((env.get("BENCH_DEPTH"), env.get("BENCH_ONECONF")))
        return _Result(61.25)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.delenv("BENCH_FULL_ROW", raising=False)
    assert bench._measure_full_depth(8, _deadline()) == 61.25
    assert seen == [("full", "8,0,all,0,0")]


def test_measure_full_depth_disabled_and_failed(bench, monkeypatch):
    import subprocess

    monkeypatch.setenv("BENCH_FULL_ROW", "0")
    assert bench._measure_full_depth(8, _deadline()) == 0.0
    monkeypatch.delenv("BENCH_FULL_ROW", raising=False)

    def fake_run(cmd, capture_output, text, timeout, env):
        r = _Result(0.0)
        r.stdout = ""
        r.stderr = "boom\n"
        r.returncode = 1
        return r

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._measure_full_depth(8, _deadline()) == 0.0
