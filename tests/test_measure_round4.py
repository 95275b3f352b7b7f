"""scripts/measure_round4.py flow: speedup parsing, flip decision,
sidecar writing, and validation rollback — with stub benches (the real
ones need TPU hardware)."""

import importlib.util
import json
import os
import subprocess
import sys

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
    m = _load()
    win = _stub(tmp_path, "win.py", "print('speedup: 1.500x')\n")
    monkeypatch.setattr(m, "BENCHES", {"encoder_stack": win})
    monkeypatch.setattr(m, "ROOT", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["measure_round4.py"])
    prior = {"switches": {"decoder_stack": True}, "measurements": {}}
    (tmp_path / "pallas_tuned.json").write_text(json.dumps(prior))
    # ROOT has no test.py -> the validation subprocess fails -> rollback
    monkeypatch.setattr(subprocess, "run", _fail_on_test_py(
        subprocess.run))
    assert m.main() == 1
    data = json.load(open(tmp_path / "pallas_tuned.json"))
    assert data == prior                      # rolled back verbatim


def _fail_on_test_py(real_run):
    def run(argv, **kw):
        if any(str(a).endswith("test.py") for a in argv):
            class P:                           # noqa: N801
                returncode = 1
                stdout = ""
                stderr = "compile failed"
            return P()
        return real_run(argv, **kw)
    return run
