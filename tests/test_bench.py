"""bench.py orchestration contract tests (CPU, no TPU needed).

The driver parses bench.py's single JSON line; round 3 produced none
(BENCH_r03.json rc=124/parsed=null). These tests pin the round-4
robustness contract: a line is emitted under budget exhaustion and
under SIGTERM, workers run on a forced-CPU platform, and a wedge-day
emit cites the last successful measurement.
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
BENCH = REPO / "bench.py"


def _env(**extra):
    env = dict(os.environ)
    env["CFDBENCH_BENCH_PLATFORM"] = "cpu"
    env.update({k: str(v) for k, v in extra.items()})
    return env


def test_ping_worker_cpu():
    p = subprocess.run(
        [sys.executable, str(BENCH), "--worker", '{"kind": "ping"}'],
        capture_output=True, text=True, timeout=180, env=_env(),
    )
    assert p.returncode == 0, p.stderr
    out = json.loads(p.stdout.strip().splitlines()[-1])
    assert out["platform"] == "cpu"
    assert out["sync_roundtrip_ms"] > 0
    # heartbeats mark the compile/execute boundary for wedge attribution
    assert "ping: compile done" in p.stderr


def test_budget_exhaustion_still_emits(tmp_path):
    p = subprocess.run(
        [sys.executable, str(BENCH)], capture_output=True, text=True,
        timeout=120,
        env=_env(
            CFDBENCH_BENCH_BUDGET_SEC=3,
            CFDBENCH_BENCH_PARTIAL=tmp_path / "partial.json",
            CFDBENCH_BENCH_HISTORY=tmp_path / "hist.jsonl",
            CFDBENCH_BENCH_DETAILS=tmp_path / "details.json",
        ),
    )
    assert p.returncode == 0, p.stderr
    line = p.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "fno_rollout_frames_per_sec_per_chip"
    assert out["value"] == 0.0
    assert out["details"]["n_skipped_for_budget"] > 0  # all skipped
    # The round-5 compact-line contract: the final stdout line must be
    # bounded (BENCH_r04's multi-KB line was tail-truncated by the
    # driver → parsed=null) and nothing may follow it on stdout.
    assert len(line.encode()) < 2048
    # Full snapshot (incl. the raw skip list) lives in the sidecar.
    sidecar = json.loads((tmp_path / "details.json").read_text())
    assert sidecar["details"]["skipped_for_budget"]


def test_sigterm_emits_line(tmp_path):
    """timeout(1) sends SIGTERM — the round-3 kill path must now still
    yield a parsed line."""
    proc = subprocess.Popen(
        [sys.executable, str(BENCH)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=_env(
            CFDBENCH_BENCH_BUDGET_SEC=600,
            CFDBENCH_BENCH_PARTIAL=tmp_path / "partial.json",
            CFDBENCH_BENCH_HISTORY=tmp_path / "hist.jsonl",
            CFDBENCH_BENCH_DETAILS=tmp_path / "details.json",
        ),
    )
    # Wait for the orchestrator's first "[bench] ..." stderr line: it
    # proves BenchRun is constructed and the signal handlers installed
    # (a fixed sleep raced on a loaded 1-core host).
    line = proc.stderr.readline()
    assert "[bench]" in line, line
    time.sleep(1)  # mid-ping
    proc.send_signal(signal.SIGTERM)
    stdout, _ = proc.communicate(timeout=60)
    out = json.loads(stdout.strip().splitlines()[-1])
    assert out["details"]["interrupted_by_signal"] == signal.SIGTERM
    assert "value" in out and "vs_baseline" in out


def test_remeasure_baseline_sigterm_keeps_schema(tmp_path):
    """--remeasure-baseline prints a {"baseline": ...} dict; a driver
    kill must yield that schema (baseline=null), not a 0-valued
    rollout-metric line that could be mistaken for a measurement."""
    proc = subprocess.Popen(
        [sys.executable, str(BENCH), "--remeasure-baseline"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=_env(
            CFDBENCH_BENCH_BUDGET_SEC=600,
            CFDBENCH_BENCH_PARTIAL=tmp_path / "partial.json",
            CFDBENCH_BENCH_HISTORY=tmp_path / "hist.jsonl",
            CFDBENCH_BENCH_DETAILS=tmp_path / "details.json",
        ),
    )
    line = proc.stderr.readline()
    assert "[bench]" in line, line
    proc.send_signal(signal.SIGTERM)
    # generous: on the loaded 1-core host the worker subprocess's jax
    # import can hold the CPU for tens of seconds before the parent's
    # handler gets scheduled.
    stdout, _ = proc.communicate(timeout=150)
    out = json.loads(stdout.strip().splitlines()[-1])
    assert out == {
        "baseline": None, "interrupted_by_signal": signal.SIGTERM
    }


def test_last_known_good_attachment(tmp_path, monkeypatch):
    import bench

    # BenchRun installs SIGTERM/SIGINT handlers that os._exit; restore
    # pytest's afterward.
    old = {s: signal.getsignal(s) for s in (signal.SIGTERM, signal.SIGINT)}
    try:
        _run_last_known_good(tmp_path, monkeypatch, bench)
    finally:
        for s, h in old.items():
            signal.signal(s, h)


def _run_last_known_good(tmp_path, monkeypatch, bench):

    hist = tmp_path / "hist.jsonl"
    hist.write_text(json.dumps(dict(
        ts=time.time() - 3600, value=62345.0,
        details={"rollout_fps_bf16": {"128": 62345.0}},
    )) + "\n")
    monkeypatch.setattr(bench, "HISTORY_PATH", str(hist))
    monkeypatch.setattr(bench, "PARTIAL_PATH", str(tmp_path / "p.json"))
    monkeypatch.setattr(bench, "DETAILS_PATH", str(tmp_path / "d.json"))

    br = bench.BenchRun(budget=1.0)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        br.emit()
    out = json.loads(buf.getvalue().strip())
    assert out["value"] == 0.0
    # Compact line carries the machine-usable stale mirror; the full
    # last_known_good provenance lives in the sidecar snapshot.
    assert out["stale_value"] == 62345.0
    assert out["stale_age_sec"] >= 3600
    sidecar = json.loads((tmp_path / "d.json").read_text())
    lkg = sidecar["details"]["last_known_good"]
    assert lkg["value"] == 62345.0
    assert lkg["age_sec"] >= 3600
    # and a successful run appends to history instead
    br2 = bench.BenchRun(budget=1.0)
    br2.rollout["128"] = 50000.0
    buf = io.StringIO()
    with redirect_stdout(buf):
        br2.emit()
    lines = [ln for ln in hist.read_text().splitlines() if ln]
    assert len(lines) == 2
    assert json.loads(lines[-1])["value"] == 50000.0


def test_retry_is_deferred_and_honors_cost_estimate(tmp_path, monkeypatch):
    """A crashed worker's retry is DEFERRED to flush_deferred — an
    immediate retry of an expensive worker starves every family behind
    it in the schedule (round 5: a stalled unet train worker burned
    2x240 s and budget-skipped resnet + gencast). The deferred retry
    still honors the cost-estimate guard, and its result lands in
    details via the apply callback."""
    import bench

    # BenchRun installs SIGTERM/SIGINT handlers that os._exit; restore
    # pytest's afterward. Partial snapshots go to tmp, not the real
    # repo-root bench_partial.json artifact.
    monkeypatch.setattr(bench, "PARTIAL_PATH", str(tmp_path / "p.json"))
    old = {s: signal.getsignal(s) for s in (signal.SIGTERM, signal.SIGINT)}
    try:
        br = bench.BenchRun(budget=1000)
        attempts = []
        fail_first = {"x": True}

        def fake_run_once(spec, timeout=None):
            attempts.append(spec["kind"])
            br.budget -= 150  # simulate the attempt consuming budget
            if fail_first.pop(spec["kind"], False):
                return None  # crash on the first attempt only
            return {"ok": spec["kind"]}

        br._run_once = fake_run_once
        applied = {}

        # First pass: x crashes (1 attempt, no immediate retry), y runs.
        out = br.run({"kind": "x"}, est=180,
                     apply=lambda o: applied.__setitem__("x", o))
        assert out is None and attempts == ["x"]
        out = br.run({"kind": "y"}, est=50,
                     apply=lambda o: applied.__setitem__("y", o))
        assert out == {"ok": "y"} and attempts == ["x", "y"]
        assert applied == {"y": {"ok": "y"}}

        # Deferred retry succeeds and its result reaches details.
        br.flush_deferred()
        assert attempts == ["x", "y", "x"]
        assert applied["x"] == {"ok": "x"}
        assert br.deferred == []

        # A deferred retry into a too-small budget is skipped, not run.
        fail_first["z"] = True
        br.run({"kind": "z"}, est=180)
        assert attempts[-1] == "z" and len(br.deferred) == 1
        br.budget = br.elapsed() + 50  # below est=180
        br.flush_deferred()
        assert attempts[-1] == "z"  # no new attempt
        assert any(s.get("kind") == "z" for s in br.skipped)

        # immediate_retry=True restores the in-place retry (ping).
        attempts.clear()
        br.budget = br.elapsed() + 1000
        fail_first["p"] = True
        out = br.run({"kind": "p"}, est=50, immediate_retry=True)
        assert out == {"ok": "p"} and attempts == ["p", "p"]
    finally:
        for sig, h in old.items():
            signal.signal(sig, h)

def test_worker_timeout_stretches_once(tmp_path, monkeypatch):
    """Execution-hang wedge (fast ping, large executions hanging ~350 s
    then recovering — BASELINE.md §wedge, re-observed 2026-08-19): the
    FIRST worker TIMEOUT stretches the remaining workers' timeout to
    min(420 s, remaining/2), one-shot; a non-timeout crash does not."""
    import bench

    monkeypatch.setattr(bench, "PARTIAL_PATH", str(tmp_path / "p.json"))
    old = {s: signal.getsignal(s) for s in (signal.SIGTERM, signal.SIGINT)}
    try:
        br = bench.BenchRun(budget=2000)
        base = br.worker_timeout

        # A non-timeout crash first: no stretch.
        def fake_crash(spec, timeout=None):
            br.last_failure_timeout = False
            return None

        br._run_once = fake_crash
        br.run({"kind": "a"}, retry=False, est=10)
        assert br.worker_timeout == base and not br.timeout_stretched

        def fake_timeout(spec, timeout=None):
            br.last_failure_timeout = True
            return None

        br._run_once = fake_timeout
        br.run({"kind": "b"}, retry=False, est=10)
        assert br.timeout_stretched
        stretched = br.worker_timeout
        assert stretched == min(420.0, br.remaining() / 2) or (
            stretched == base  # tiny remaining budget: max() keeps base
        )
        assert stretched >= base

        # One-shot: a second timeout leaves it alone.
        br.run({"kind": "c"}, retry=False, est=10)
        assert br.worker_timeout == stretched
    finally:
        for sig, h in old.items():
            signal.signal(sig, h)
