"""bench.py lever-autotune logic: subprocess orchestration is stubbed so
the parse / budget rules are exercised without TPU time.

Round-5 bench semantics: the headline measures the FULL-depth parity mode;
levers probe layout:on / remat:mid / dremat:on on that same mode
(hardware-rejected fusedblk/fusebn are deliberately absent); a pruned
continuity row runs in one subprocess (BENCH_DEPTH=pruned)."""

import importlib.util
import sys
import time

import pytest


def _deadline(seconds=3600.0):
    """A generous future deadline — these tests exercise parse rules,
    never the budget cutoff (which has its own test)."""
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


def _lever_key(env):
    if env.get("BENCH_AUTO_LAYOUT") == "1":
        return "layout:on"
    if env.get("BENCH_DREMAT") == "1":
        return "dremat:on"
    remat = env["BENCH_ONECONF"].split(",")[2]
    return "remat:mid" if remat == "mid" else "base"


def _patch_run(monkeypatch, values, calls):
    import subprocess

    def fake_run(cmd, capture_output, text, timeout, env):
        key = _lever_key(env)
        calls.append((key, env["BENCH_ONECONF"]))
        return _Result(values[key])

    monkeypatch.setattr(subprocess, "run", fake_run)


def test_probe_levers_returns_best(bench, monkeypatch):
    calls = []
    values = {"layout:on": 44.0, "remat:mid": 39.0, "dremat:on": 41.0}
    _patch_run(monkeypatch, values, calls)
    monkeypatch.delenv("BENCH_AUTOTUNE", raising=False)
    best = bench._probe_levers(8, 41.5, _deadline())
    assert best == 44.0
    assert [c[0] for c in calls] == ["layout:on", "remat:mid", "dremat:on"]
    assert all(c[1].startswith("8,0,") for c in calls)
    # the hardware-rejected levers must NOT be probed (VERDICT r4 #3:
    # re-probing fusedblk burned the budget remat:mid never got)
    assert all("1" not in c[1].split(",")[3:] for c in calls)


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
    assert bench._probe_levers(8, 100.0, _deadline()) == 100.0
    assert len(calls) == 3


def test_measure_pruned_sets_env_and_parses(bench, monkeypatch):
    """The pruned continuity row runs one child with BENCH_DEPTH=pruned
    and returns its parsed value; it never competes with the full-depth
    headline."""
    import subprocess

    seen = []

    def fake_run(cmd, capture_output, text, timeout, env):
        seen.append((env.get("BENCH_DEPTH"), env.get("BENCH_ONECONF")))
        return _Result(111.25)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.delenv("BENCH_PRUNED_ROW", raising=False)
    assert bench._measure_pruned(8, _deadline()) == 111.25
    assert seen == [("pruned", "8,0,all,0,0")]


def test_measure_pruned_disabled_and_failed(bench, monkeypatch):
    import subprocess

    monkeypatch.setenv("BENCH_PRUNED_ROW", "0")
    assert bench._measure_pruned(8, _deadline()) == 0.0
    monkeypatch.delenv("BENCH_PRUNED_ROW", raising=False)

    def fake_run(cmd, capture_output, text, timeout, env):
        r = _Result(0.0)
        r.stdout = ""
        r.stderr = "boom\n"
        r.returncode = 1
        return r

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._measure_pruned(8, _deadline()) == 0.0


def test_emit_headline_is_full_depth(bench, capsys):
    """The emitted JSON's value/mfu describe the full-depth parity mode;
    pruned is a continuity field."""
    import json

    bench._emit(41.56, 111.33, 6.5e11)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["value"] == 41.56
    assert out["mode"] == "full_depth"
    assert out["pruned"] == 111.33
    assert 0.0 < out["mfu"] < 1.0
    assert out["vs_baseline"] == round(41.56 / 2000.0, 4)
