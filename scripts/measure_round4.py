"""Round-4 kernel-variant measurement harvest.

Runs the three pending A/B benches (each in its own subprocess — the
box's allocator-pressure artifact makes in-process sequencing lie, see
docs/performance.md) and writes the winners to pallas_tuned.json, which
ops/pallas_config reads as the process-wide default. One command, so a
short tunnel window is enough to both measure and flip:

    python scripts/measure_round4.py            # all three + validation
    python scripts/measure_round4.py enc dec    # subset
    python scripts/measure_round4.py --no-validate   # skip the final
        # end-to-end compile validation of the flipped configuration

Each bench prints `speedup: X.XXXx` (variant vs the hardware-validated
round-3 chain); a variant wins when speedup >= 1.02 (the ±2 ms tunnel
noise band on a ~10 ms stage). Subprocesses are retried on the axon
backend-init outage pattern, mirroring bench.py.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BENCHES = {
    "vit_pair_blocks": "scripts/bench_backbone_pair.py",
    "encoder_stack": "scripts/bench_encoder_stack.py",
    "decoder_stack": "scripts/bench_decoder_stack.py",
}
ALIASES = {"vit": "vit_pair_blocks", "pair": "vit_pair_blocks",
           "enc": "encoder_stack", "dec": "decoder_stack"}
WIN_THRESHOLD = 1.02
RETRY_BACKOFF = (30, 60, 120)
INIT_ERR = "Unable to initialize backend"


def run_bench(script: str) -> "tuple[float | None, str]":
    """Run one A/B bench, retrying the known backend-init outage.
    Returns (speedup or None, last stdout tail)."""
    for attempt, backoff in enumerate(RETRY_BACKOFF + (None,)):
        proc = subprocess.run(
            [sys.executable, "-u", os.path.join(ROOT, script)],
            capture_output=True, text=True, timeout=3600, cwd=ROOT)
        out = proc.stdout + proc.stderr
        m = re.search(r"speedup: ([0-9.]+)x", out)
        if proc.returncode == 0 and m:
            return float(m.group(1)), out[-2000:]
        if INIT_ERR not in out or backoff is None:
            return None, out[-2000:]
        print(f"  backend init failed (attempt {attempt + 1}); "
              f"retrying in {backoff}s", flush=True)
        time.sleep(backoff)
    return None, out[-2000:]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    names = [ALIASES.get(a, a) for a in args] or list(BENCHES)
    bad = [n for n in names if n not in BENCHES]
    if bad:
        print(f"unknown bench(es): {bad}; known: {list(BENCHES)}")
        return 2

    path = os.path.join(ROOT, "pallas_tuned.json")
    data = {"switches": {}, "measurements": {}}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
        data.setdefault("switches", {})
        data.setdefault("measurements", {})

    failures = 0
    for name in names:
        script = BENCHES[name]
        print(f"== {name} ({script})", flush=True)
        speedup, tail = run_bench(script)
        if speedup is None:
            print(f"  FAILED; tail:\n{tail}", flush=True)
            failures += 1
            continue
        win = speedup >= WIN_THRESHOLD
        data["switches"][name] = win
        data["measurements"][name] = {
            "speedup": speedup, "threshold": WIN_THRESHOLD,
            "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
        print(f"  speedup {speedup:.3f}x -> "
              f"{'ENABLE' if win else 'keep chain'}", flush=True)

    prev = None
    if os.path.exists(path):
        with open(path) as f:
            prev = f.read()
    with open(path, "w") as f:
        json.dump(data, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"wrote {path}: {data['switches']}", flush=True)

    if any(data["switches"].values()) and "--no-validate" not in sys.argv:
        # compile-validate the flipped configuration end to end (the A/B
        # benches compile each kernel in isolation; this catches
        # interactions) — on failure roll the sidecar back
        print("validating flipped configuration (synthetic eval)...",
              flush=True)
        proc = subprocess.run(
            [sys.executable, "-u", "test.py", "configs/synthetic.py",
             "--work-dir", "/tmp/measure_r4_validate",
             "--cfg-options", "model.use_flash=True"],
            capture_output=True, text=True, timeout=1800, cwd=ROOT)
        if proc.returncode != 0:
            print("VALIDATION FAILED — rolling back pallas_tuned.json; "
                  f"tail:\n{(proc.stdout + proc.stderr)[-2000:]}",
                  flush=True)
            if prev is None:
                os.remove(path)
            else:
                with open(path, "w") as f:
                    f.write(prev)
            return 1
        print("validation ok", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
