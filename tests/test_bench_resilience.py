"""bench.py capture resilience (round-3 postmortem: a transient
'Unable to initialize backend' outage in the first phase subprocess
zeroed the whole round's BENCH file).

Contract under a forced backend failure (child env JAX_PLATFORMS=bogus):
- each phase is retried (attempt lines on stderr),
- the final stdout line is STILL a JSON object, carrying an "errors" key
  instead of nothing,
- the retryable-failure detector recognizes the exact round-3 message.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def test_retryable_detector_matches_round3_failure():
    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.remove(REPO)
    r3 = "RuntimeError: Unable to initialize backend 'axon': UNAVAILABLE"
    assert bench._retryable(1, r3)
    assert bench._retryable(-9, "")            # child timeout
    assert not bench._retryable(1, "AssertionError: shapes differ")


@pytest.mark.slow
def test_bench_forced_backend_failure_retries_and_prints_partial_json():
    env = dict(os.environ, JAX_PLATFORMS="bogus")
    proc = subprocess.run(
        [sys.executable, BENCH, "--phases=eval", "--max-attempts=2",
         "--backoff-scale=0", "--phase-timeout=240"],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        timeout=900)
    stdout = proc.stdout.decode()
    stderr = proc.stderr.decode()

    # the final stdout line must be parseable JSON with the errors key
    json_lines = [ln for ln in stdout.splitlines() if ln.startswith("{")]
    assert json_lines, f"no JSON line printed:\n{stdout}\n{stderr}"
    out = json.loads(json_lines[-1])
    assert "errors" in out
    assert "eval" in out["errors"]
    # nothing was measured -> exit code 2 (but the JSON above still stands)
    assert proc.returncode == 2

    # the backend-init failure was classified retryable and retried
    assert "attempt 1/2" in stderr and "attempt 2/2" in stderr
    assert "backend-init/timeout" in stderr
    # preflight diagnostic ran before the phases
    assert "preflight" in stderr


PHASE_LABELS = ("eval", "eval_fp32", "eval5", "disk_eval", "train_fp32",
                "train_bf16", "train_fp32_5shot", "train_bf16_5shot")


@pytest.mark.slow
def test_bench_full_phase_list_respects_budget_under_outer_deadline():
    """Round-4 postmortem: the driver's outer timeout (rc=124) killed
    bench.py BEFORE the always-print-JSON line because worst-case retry
    wall time was unbounded. Contract now: with the FULL default phase
    list, default retry counts/backoffs, a dead backend, and a
    driver-style outer deadline, bench.py must finish WITHIN its
    --budget-s (degraded mode: preflight exhausts -> one short attempt
    per phase -> skip the rest) and the last stdout line must still be
    parseable JSON naming every phase in "errors"."""
    env = dict(os.environ, JAX_PLATFORMS="bogus")
    outer_deadline = 300         # the simulated driver kill window
    proc = subprocess.run(
        [sys.executable, BENCH, "--budget-s=75"],   # all other args default
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        timeout=outer_deadline)  # raising TimeoutExpired = contract broken
    stdout = proc.stdout.decode()
    stderr = proc.stderr.decode()

    json_lines = [ln for ln in stdout.splitlines() if ln.startswith("{")]
    assert json_lines, f"no JSON line printed:\n{stdout}\n{stderr}"
    out = json.loads(json_lines[-1])
    assert "errors" in out
    assert "preflight" in out["errors"]
    # EVERY phase of the full default list is accounted for — attempted
    # (degraded single short attempt) or explicitly skipped, never lost
    for label in PHASE_LABELS:
        assert label in out["errors"], f"{label} missing: {out['errors']}"
    assert proc.returncode == 2          # nothing measured, JSON stands
    assert "DEGRADED" in stderr


@pytest.mark.slow
def test_bench_sigterm_midrun_still_prints_snapshot():
    """GNU timeout (the driver's likely kill mechanism) sends SIGTERM
    before SIGKILL. bench.py traps it and flushes the cumulative snapshot
    so whatever phases completed stay on the record. The TERM may land at
    ANY point after startup (attempt, backoff sleep, child wait) — the
    handler must produce a parseable last JSON line regardless."""
    import signal as _signal
    import time as _time
    env = dict(os.environ, JAX_PLATFORMS="bogus")
    proc = subprocess.Popen(
        [sys.executable, BENCH, "--phases=eval", "--max-attempts=3",
         "--backoff-scale=1", "--phase-timeout=240"],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    _time.sleep(20)              # past startup + handler registration
    proc.send_signal(_signal.SIGTERM)
    out, err = proc.communicate(timeout=60)
    json_lines = [ln for ln in out.decode().splitlines()
                  if ln.startswith("{")]
    assert json_lines, f"no JSON line printed:\n{out}\n{err.decode()}"
    snap = json.loads(json_lines[-1])
    assert "killed" in snap.get("errors", {}), snap
    assert proc.returncode == 1
