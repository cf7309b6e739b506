"""bench.py must never hang forever or exit without its one JSON line.

Round-4 ninth session: a live half-up relay (device enumeration answered, the
first compile wedged indefinitely) and a mid-run worker crash
(JaxRuntimeError FAILED_PRECONDITION escaping as a bare traceback) both
produced bench runs with NO parseable output. `_run_guarded` covers both:
a watchdog bounds total wall time, and a crash retries once in a fresh
process before emitting the error line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

import bench


def test_success_path_is_silent(capsys):
    bench._run_guarded(lambda: None, "m", "u")
    assert capsys.readouterr().out == ""


def test_crash_retries_once_in_fresh_process(monkeypatch):
    calls = {}

    def fake_execv(exe, argv):
        calls["argv"] = (exe, argv)
        raise SystemExit(99)  # stand-in for the process image swap

    monkeypatch.delenv("AIIS_BENCH_RETRIED", raising=False)
    monkeypatch.setenv("AIIS_BENCH_RETRY_DELAY_S", "0")
    monkeypatch.setenv("AIIS_BENCH_DEADLINE_S", "0")
    monkeypatch.setattr(os, "execv", fake_execv)

    def boom():
        raise RuntimeError("FAILED_PRECONDITION: TPU backend error")

    with pytest.raises(SystemExit):
        bench._run_guarded(boom, "m", "u")
    assert calls["argv"][0] == sys.executable
    # the retried process must know it is the retry
    assert os.environ["AIIS_BENCH_RETRIED"] == "1"


def test_second_crash_emits_error_json(monkeypatch, capsys):
    monkeypatch.setenv("AIIS_BENCH_RETRIED", "1")
    monkeypatch.setenv("AIIS_BENCH_DEADLINE_S", "0")

    def boom():
        raise RuntimeError("still down")

    with pytest.raises(SystemExit) as exc_info:
        bench._run_guarded(boom, "wd_vit_tagging_throughput",
                           "images/sec/chip")
    assert exc_info.value.code == 1
    line = json.loads(capsys.readouterr().out.strip())
    assert line["metric"] == "wd_vit_tagging_throughput"
    assert line["value"] == 0.0
    assert "still down" in line["error"]


def test_measured_headline_survives_secondary_crash(monkeypatch, capsys):
    """A dead SECONDARY bench must never erase a measured headline: the guard
    emits the partial headline (flagged) instead of a zero line."""
    monkeypatch.setenv("AIIS_BENCH_RETRIED", "1")
    monkeypatch.setenv("AIIS_BENCH_DEADLINE_S", "0")
    monkeypatch.setitem(bench._PARTIAL_HEADLINE, "metric",
                        "wd_vit_tagging_throughput")
    monkeypatch.setitem(bench._PARTIAL_HEADLINE, "value", 147.0)

    def boom():
        raise RuntimeError("query bench wedged")

    with pytest.raises(SystemExit):
        bench._run_guarded(boom, "wd_vit_tagging_throughput",
                           "images/sec/chip")
    line = json.loads(capsys.readouterr().out.strip())
    assert line["value"] == 147.0
    assert "query bench wedged" in line["partial"]


def test_partial_headline_rides_the_retry_exec_env(monkeypatch, capsys):
    monkeypatch.delenv("AIIS_BENCH_RETRIED", raising=False)
    monkeypatch.setenv("AIIS_BENCH_RETRY_DELAY_S", "0")
    monkeypatch.setenv("AIIS_BENCH_DEADLINE_S", "0")
    monkeypatch.setitem(bench._PARTIAL_HEADLINE, "metric", "m")
    monkeypatch.setitem(bench._PARTIAL_HEADLINE, "value", 9.0)
    monkeypatch.setattr(os, "execv",
                        lambda exe, argv: (_ for _ in ()).throw(SystemExit(99)))

    def boom():
        raise RuntimeError("crash")

    with pytest.raises(SystemExit):
        bench._run_guarded(boom, "m", "u")
    # the pre-retry process exported its measured headline for the retry
    assert json.loads(os.environ["AIIS_BENCH_PARTIAL"])["value"] == 9.0
    # a fresh process (empty _PARTIAL_HEADLINE) falls back to the env copy
    monkeypatch.setattr(bench, "_PARTIAL_HEADLINE", {})
    line = json.loads(bench._error_line("m", "u", "still down"))
    assert line["value"] == 9.0 and "still down" in line["partial"]
    # bench code writes this key directly; monkeypatch can't restore it
    os.environ.pop("AIIS_BENCH_PARTIAL", None)


def test_watchdog_bounds_a_wedged_run():
    # Real subprocess: the watchdog uses os._exit, which would kill pytest.
    src = (
        "import bench, time\n"
        "bench._run_guarded(lambda: time.sleep(60), 'm', 'u')\n"
    )
    env = dict(os.environ,
               AIIS_BENCH_DEADLINE_S="1",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    out = subprocess.run([sys.executable, "-c", src], capture_output=True,
                         text=True, timeout=30, env=env)
    assert out.returncode == 1
    line = json.loads(out.stdout.strip())
    assert "watchdog" in line["error"]


def test_retry_deadline_subtracts_first_attempt(monkeypatch):
    """The one fresh-process retry must NOT restart the watchdog from zero:
    the first attempt's start time rides AIIS_BENCH_T0 across the exec and
    the retried guard arms only the remaining budget (floored), so total wall
    time stays ~one deadline, not two (ADVICE r4)."""
    import threading
    import time as _time

    import bench

    monkeypatch.setenv("AIIS_BENCH_RETRIED", "1")  # no second exec
    monkeypatch.setenv("AIIS_BENCH_DEADLINE_S", "1000")
    # pretend the first attempt burned 990 s before exec'ing us
    monkeypatch.setenv("AIIS_BENCH_T0", repr(_time.monotonic() - 990.0))

    armed = {}
    real_timer = threading.Timer

    class SpyTimer(real_timer):
        def __init__(self, interval, fn, *a, **kw):
            armed["interval"] = interval
            super().__init__(interval, fn, *a, **kw)

    monkeypatch.setattr(threading, "Timer", SpyTimer)
    bench._run_guarded(lambda: None, "m", "u")
    # 1000 - 990 = 10 remaining, floored to 30
    assert armed["interval"] == 30.0

    # and a first (non-exec'd) run arms the full deadline
    monkeypatch.delenv("AIIS_BENCH_T0", raising=False)
    bench._run_guarded(lambda: None, "m", "u")
    assert armed["interval"] == 1000.0
    # T0 is only exported on the retry-exec path, never by a clean run
    assert "AIIS_BENCH_T0" not in os.environ


def test_watchdog_cancelled_after_completion(monkeypatch):
    """A finished guard must leave NO armed watchdog behind: tests (and any
    importer) call _run_guarded in a long-lived process, and a leftover timer
    os._exit(1)s that process minutes later — this silently killed full
    pytest runs at the 1000 s mark before the finally-cancel existed."""
    import threading

    import bench

    import time as _time

    monkeypatch.setenv("AIIS_BENCH_DEADLINE_S", "1000")
    before = {t for t in threading.enumerate() if isinstance(t, threading.Timer)}
    bench._run_guarded(lambda: None, "m", "u")

    def leftover():
        return [t for t in threading.enumerate()
                if isinstance(t, threading.Timer) and t not in before
                and t.is_alive()]

    # cancel() wakes the timer thread asynchronously; give it a moment to die
    deadline = _time.monotonic() + 5.0
    while leftover() and _time.monotonic() < deadline:
        _time.sleep(0.05)
    assert not leftover()


def test_retry_exec_exports_t0(monkeypatch):
    """The crash->exec path must export AIIS_BENCH_T0 so the retried process
    can subtract the first attempt's elapsed time."""
    import bench

    monkeypatch.delenv("AIIS_BENCH_RETRIED", raising=False)
    monkeypatch.delenv("AIIS_BENCH_T0", raising=False)
    monkeypatch.setenv("AIIS_BENCH_RETRY_DELAY_S", "0")
    monkeypatch.setenv("AIIS_BENCH_DEADLINE_S", "0")
    execd = {}

    def fake_execv(*a):
        execd["args"] = a
        raise SystemExit(99)  # stand-in for the process image swap

    monkeypatch.setattr(os, "execv", fake_execv)
    with pytest.raises(SystemExit):
        bench._run_guarded(lambda: 1 / 0, "m", "u")
    assert "args" in execd
    assert "AIIS_BENCH_T0" in os.environ
    float(os.environ["AIIS_BENCH_T0"])  # parseable
    for k in ("AIIS_BENCH_T0", "AIIS_BENCH_RETRIED"):
        os.environ.pop(k, None)  # written directly by bench code
