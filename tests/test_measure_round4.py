"""scripts/measure_round4.py flow: speedup parsing, flip decision,
sidecar writing, and validation rollback — with stub benches (the real
ones need TPU hardware)."""

import importlib.util
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "measure_round4", os.path.join(ROOT, "scripts/measure_round4.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _stub(tmp_path, name, body):
    p = tmp_path / name
    p.write_text(body)
    return str(p)


def test_run_bench_parses_speedup(tmp_path):
    m = _load()
    fast = _stub(tmp_path, "fast.py",
                 "print('chain: 10.00 ms')\nprint('speedup: 1.500x')\n")
    speedup, _ = m.run_bench(fast)
    assert speedup == 1.5


def test_run_bench_failure_returns_none(tmp_path):
    m = _load()
    bad = _stub(tmp_path, "bad.py", "raise SystemExit('boom')\n")
    speedup, tail = m.run_bench(bad)
    assert speedup is None
    assert "boom" in tail


def test_main_writes_flips_and_keeps_chain_on_loss(tmp_path, monkeypatch):
    m = _load()
    win = _stub(tmp_path, "win.py", "print('speedup: 1.210x')\n")
    lose = _stub(tmp_path, "lose.py", "print('speedup: 0.930x')\n")
    monkeypatch.setattr(m, "BENCHES", {"encoder_stack": win,
                                       "decoder_stack": lose})
    monkeypatch.setattr(m, "ROOT", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["measure_round4.py",
                                      "--no-validate"])
    assert m.main() == 0
    data = json.load(open(tmp_path / "pallas_tuned.json"))
    assert data["switches"] == {"encoder_stack": True,
                                "decoder_stack": False}
    assert data["measurements"]["encoder_stack"]["speedup"] == 1.21


def test_main_validation_rollback(tmp_path, monkeypatch):
    """A flipped configuration that FAILS the numeric gate (e.g. a
    silent coordinate shift) must roll the sidecar back verbatim."""
    m = _load()
    win = _stub(tmp_path, "win.py", "print('speedup: 1.500x')\n")
    monkeypatch.setattr(m, "BENCHES", {"encoder_stack": win})
    monkeypatch.setattr(m, "ROOT", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["measure_round4.py"])
    prior = {"switches": {"decoder_stack": True}, "measurements": {}}
    (tmp_path / "pallas_tuned.json").write_text(json.dumps(prior))
    monkeypatch.setattr(
        m, "validate_flipped",
        lambda: (False, '{"ok": false, "max_delta_px": 9.1}'))
    assert m.main() == 1
    data = json.load(open(tmp_path / "pallas_tuned.json"))
    assert data == prior                      # rolled back verbatim


def test_main_validation_pass_keeps_sidecar(tmp_path, monkeypatch):
    m = _load()
    win = _stub(tmp_path, "win.py", "print('speedup: 1.500x')\n")
    monkeypatch.setattr(m, "BENCHES", {"encoder_stack": win})
    monkeypatch.setattr(m, "ROOT", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["measure_round4.py"])
    monkeypatch.setattr(
        m, "validate_flipped",
        lambda: (True, '{"ok": true, "max_delta_px": 0.01}'))
    assert m.main() == 0
    data = json.load(open(tmp_path / "pallas_tuned.json"))
    assert data["switches"] == {"encoder_stack": True}


def test_run_bench_survives_hung_child(tmp_path, monkeypatch):
    """A hung bench child (the axon outage mode) must be a retryable
    failure, not an uncaught TimeoutExpired that crashes the harvest
    and loses already-measured winners."""
    m = _load()
    hang = _stub(tmp_path, "hang.py", "import time; time.sleep(60)\n")
    calls = []
    real_run = subprocess.run

    def fake_run(argv, **kw):
        calls.append(argv)
        kw["timeout"] = 1 if str(argv[-1]).endswith("hang.py") else \
            kw.get("timeout")
        return real_run(argv, **kw)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(m, "RETRY_BACKOFF", ())    # no sleeps in tests
    speedup, tail = m.run_bench(hang)
    assert speedup is None
    assert "timed out" in tail


def test_wait_for_backend_then_harvest(tmp_path, monkeypatch):
    """--wait-for-backend polls until the probe answers, then harvests
    and (unattended mode) re-captures the bench headline."""
    m = _load()
    win = _stub(tmp_path, "win.py", "print('speedup: 1.300x')\n")
    monkeypatch.setattr(m, "BENCHES", {"encoder_stack": win})
    monkeypatch.setattr(m, "ROOT", str(tmp_path))
    monkeypatch.setattr(sys, "argv",
                        ["measure_round4.py", "--wait-for-backend=1",
                         "--no-validate"])
    probes = iter([False, False, True])
    monkeypatch.setattr(m, "backend_ready",
                        lambda *a, **kw: next(probes))
    monkeypatch.setattr(time, "sleep", lambda s: None)
    bench_ran = []
    monkeypatch.setattr(m, "run_final_bench",
                        lambda: bench_ran.append(1) or 0)
    assert m.main() == 0
    assert bench_ran == [1]
    data = json.load(open(tmp_path / "pallas_tuned.json"))
    assert data["switches"] == {"encoder_stack": True}


def test_wait_for_backend_gives_up(monkeypatch):
    m = _load()
    monkeypatch.setattr(m, "backend_ready", lambda *a, **kw: False)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    assert m.wait_for_backend(max_hours=1e-9) is False
