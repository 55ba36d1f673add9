"""The bench gate must be un-losable: a transient relay failure mid-run cost
round 2 its official perf record (BENCH_r02.json rc=1). These tests run the
real `bench.py` supervisor end-to-end at tiny CPU shapes with injected
relay-shaped faults and assert the headline JSON line survives with rc=0.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(fault: str, **extra_env):
    env = dict(os.environ)
    env.update(
        G4D_BENCH_SHAPES="tiny",
        G4D_BENCH_PLATFORM="cpu",
        G4D_BENCH_FAULT=fault,
        G4D_BENCH_BUDGET_S="540",
        **extra_env,
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    records = []
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line:
            records.append(json.loads(line))  # stdout must be JSON-only
    return proc, records


def _check_headline(proc, records):
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert records, f"no headline JSON on stdout; stderr: {proc.stderr[-3000:]}"
    last = records[-1]
    assert last["metric"] == "posed_stage_frames_per_sec_per_chip"
    assert last["value"] > 0
    assert last["unit"] == "frames/s"
    assert last["vs_baseline"] > 0


def test_headline_survives_crash_after_measurement():
    """Worker dies right after the headline prints: no retry needed, record
    is already on stdout, exit code stays 0."""
    proc, records = _run_bench(fault="post_headline")
    _check_headline(proc, records)
    assert "injecting fault at post_headline" in proc.stderr
    assert "starting worker attempt 2" not in proc.stderr


def test_headline_survives_crash_before_measurement():
    """Worker dies before any measurement: the supervisor restarts it
    (fresh backend, headline-only) and still produces the record."""
    proc, records = _run_bench(fault="pre_headline")
    _check_headline(proc, records)
    assert "injecting fault at pre_headline" in proc.stderr
    assert "starting worker attempt 2" in proc.stderr


def test_headline_survives_hang_before_measurement():
    """Worker HANGS before the measurement - the wedged-chip failure shape
    that cost round 3 its record (BENCH_r03.json rc=124: a blocked host
    fetch raises nothing, so exception-based recovery never fires). The
    supervisor's stall watchdog must kill the worker and restart it."""
    # 45 s: a 20 s window starved once when the suite shared the host with
    # two compiling TPU jobs (tiny-shape CPU compiles legitimately exceeded
    # it); the assertion is about recovery, not the window size
    proc, records = _run_bench(fault="hang_pre_headline",
                               G4D_BENCH_STALL_S="45")
    _check_headline(proc, records)
    assert "injecting hang at pre_headline" in proc.stderr
    assert "no worker output for" in proc.stderr
    assert "starting worker attempt 2" in proc.stderr


def test_headline_survives_hang_after_measurement():
    """Worker hangs AFTER the headline printed: the record is already on
    stdout, the watchdog reaps the worker, exit stays 0, no retry."""
    proc, records = _run_bench(fault="hang_post_headline",
                               G4D_BENCH_STALL_S="45")
    _check_headline(proc, records)
    assert "injecting hang at post_headline" in proc.stderr
    assert "starting worker attempt 2" not in proc.stderr


def test_total_failure_emits_error_record():
    """Even when every attempt fails, the LAST stdout line must be a
    structured JSON diagnostic - rc=124 can never again mean a blank
    record. A bogus explicit weights path makes every worker attempt raise
    at startup (the silent random-init fallback was ADVICE r3 #4)."""
    proc, records = _run_bench(fault="",
                               G4D_BENCH_WEIGHTS="/nonexistent/weights.npz")
    assert proc.returncode == 1
    assert records, f"no final JSON on stdout; stderr: {proc.stderr[-3000:]}"
    last = records[-1]
    assert "error" in last
    assert len(last["attempts"]) == 3


def test_phase_heartbeat_bounded():
    """The worker's long-phase heartbeat keeps the stall watchdog fed during
    a legitimate slow compile, then goes SILENT past its cap so a truly
    wedged phase is still killed (heartbeats must never fully defeat stall
    detection)."""
    import importlib.util
    import time as _time

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    lines = []
    orig = bench._progress
    bench._progress = lambda msg: lines.append(msg)
    try:
        with bench._phase_heartbeat("slowphase", cap_s=0.25, every_s=0.1):
            _time.sleep(0.8)
    finally:
        bench._progress = orig
    beats = [m for m in lines if "still running" in m]
    caps = [m for m in lines if "heartbeat cap" in m]
    assert beats, f"no heartbeat lines: {lines}"
    assert len(caps) == 1, f"cap line missing/duplicated: {lines}"
    # silence after the cap: the cap line is the LAST line emitted
    assert lines[-1] == caps[0]
