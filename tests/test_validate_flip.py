"""scripts/validate_flip.py — the numeric-equivalence gate measure_round4
runs before persisting a kernel-variant flip. CPU interpret-mode at toy
shapes; the hardware run uses production shapes."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "validate_flip.py")


def _run(tmp_path, extra=()):
    tuned = tmp_path / "tuned.json"
    tuned.write_text(json.dumps({"switches": {
        "encoder_stack": True, "decoder_stack": True,
        "vit_pair_blocks": True}}))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               EDGECAPE_PALLAS_TUNED=str(tuned))
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--small", *extra],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900)
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON: {proc.stdout}\n{proc.stderr}"
    return proc.returncode, json.loads(lines[-1])


def test_flipped_all_on_passes_gate(tmp_path):
    rc, out = _run(tmp_path)
    assert rc == 0 and out["ok"] is True
    # all three switches were genuinely live in the flipped run
    assert all(out["switches"].values())
    # the decoder stack is tolerance-equal, not bit-exact: a small but
    # NONZERO delta proves the comparison is not vacuous (the zero-init
    # KptBranch.out identity trap), while staying inside the tolerance
    assert 0 < out["max_delta_px"] <= out["tol_px"]


def test_injected_mismatch_fails_gate(tmp_path):
    rc, out = _run(tmp_path, extra=("--inject-delta=50",))
    assert rc == 1 and out["ok"] is False
    assert out["max_delta_px"] > out["tol_px"]
