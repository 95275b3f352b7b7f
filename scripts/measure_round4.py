"""Kernel-variant measurement harvest (round-4 variants).

Runs the three pending A/B benches (each in its own subprocess — the
box's allocator-pressure artifact makes in-process sequencing lie, see
docs/performance.md) and writes the winners to pallas_tuned.json, which
ops/pallas_config reads as the process-wide default. One command, so a
short tunnel window is enough to both measure and flip:

    python scripts/measure_round4.py            # all three + validation
    python scripts/measure_round4.py enc dec    # subset
    python scripts/measure_round4.py --no-validate   # skip the final
        # numeric validation of the flipped configuration
    python scripts/measure_round4.py --wait-for-backend=12
        # poll the backend (cheap subprocess matmul probe) for up to 12h,
        # then harvest -> validate -> run bench.py, all unattended — the
        # axon tunnel was down across two judged captures, so waiting for
        # a human-noticed window is how rounds go dark

Each bench prints `speedup: X.XXXx` (variant vs the hardware-validated
round-3 chain); a variant wins when speedup >= 1.02 (the ±2 ms tunnel
noise band on a ~10 ms stage). Subprocesses are retried on the axon
backend-init outage pattern, mirroring bench.py.

Validation is NUMERIC, not just exit-0: scripts/validate_flip.py
compares decoded keypoint coordinates between the chain and the flipped
configuration under a self-calibrated tolerance (fused_decoder_stack is
tolerance-equal, not bit-exact), so a silent metric shift cannot ride
in on a speedup. On failure the sidecar is rolled back verbatim.
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
VALIDATE_SCRIPT = "scripts/validate_flip.py"
WIN_THRESHOLD = 1.02
RETRY_BACKOFF = (30, 60, 120)
INIT_ERR = "Unable to initialize backend"

# Cheap backend probe (the bench.py preflight pattern): honors env
# JAX_PLATFORMS because the image bakes jax_platforms='axon,cpu' into the
# jax config, which silently overrides the env var.
PROBE_CODE = ("import os,time,json;"
              "import jax,jax.numpy as jnp;"
              "p=os.environ.get('JAX_PLATFORMS');"
              "jax.config.update('jax_platforms', p) if p else None;"
              "x=jnp.ones((128,128)); (x@x).block_until_ready();"
              "print(json.dumps({'backend': jax.default_backend(),"
              "'devices': len(jax.devices())}))")


def run_bench(script: str) -> "tuple[float | None, str]":
    """Run one A/B bench, retrying the known backend-init outage AND
    hard hangs (a hung tunnel looks like TimeoutExpired, the exact
    outage mode this script exists to survive — it must not crash the
    harvest and lose already-measured winners)."""
    out = ""
    for attempt, backoff in enumerate(RETRY_BACKOFF + (None,)):
        try:
            proc = subprocess.run(
                [sys.executable, "-u", os.path.join(ROOT, script)],
                capture_output=True, text=True, timeout=3600, cwd=ROOT)
            out = proc.stdout + proc.stderr
            rc = proc.returncode
        except subprocess.TimeoutExpired as e:
            out = ((e.stdout or "") if isinstance(e.stdout, str)
                   else (e.stdout or b"").decode(errors="replace"))
            out += "\n[measure] bench child timed out (hung backend?)"
            rc = -9
        m = re.search(r"speedup: ([0-9.]+)x", out)
        if rc == 0 and m:
            return float(m.group(1)), out[-2000:]
        retryable = rc == -9 or INIT_ERR in out
        if not retryable or backoff is None:
            return None, out[-2000:]
        print(f"  backend init failed/hung (attempt {attempt + 1}); "
              f"retrying in {backoff}s", flush=True)
        time.sleep(backoff)
    return None, out[-2000:]


def backend_ready(timeout_s: float = 240.0) -> bool:
    """One subprocess probe with a hard timeout (a dead tunnel HANGS —
    it does not error)."""
    try:
        proc = subprocess.run([sys.executable, "-c", PROBE_CODE],
                              capture_output=True, text=True,
                              timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False
    if proc.returncode == 0:
        print(f"  backend ready: {proc.stdout.strip()}", flush=True)
        return True
    return False


def wait_for_backend(max_hours: float, probe_timeout: float = 240.0,
                     interval: float = 300.0) -> bool:
    """Poll until the backend answers or max_hours elapse."""
    deadline = time.monotonic() + max_hours * 3600.0
    n = 0
    while True:
        n += 1
        rem = deadline - time.monotonic()
        if rem <= 0:
            print(f"backend never came up within {max_hours}h "
                  f"({n - 1} probes)", flush=True)
            return False
        if backend_ready(min(probe_timeout, max(rem, 30.0))):
            return True
        rem = deadline - time.monotonic()
        if rem <= 0:
            print(f"backend never came up within {max_hours}h "
                  f"({n} probes)", flush=True)
            return False
        nap = min(interval, rem)
        print(f"  probe {n}: backend down/hung; next probe in "
              f"{nap:.0f}s ({rem / 3600:.1f}h left)", flush=True)
        time.sleep(nap)


def validate_flipped() -> "tuple[bool, str]":
    """Numeric-equivalence gate: chain vs flipped decoded coordinates
    within a self-calibrated tolerance (scripts/validate_flip.py)."""
    try:
        proc = subprocess.run(
            [sys.executable, "-u", os.path.join(ROOT, VALIDATE_SCRIPT)],
            capture_output=True, text=True, timeout=1800, cwd=ROOT)
    except subprocess.TimeoutExpired:
        return False, "validation timed out"
    out = proc.stdout + proc.stderr
    return proc.returncode == 0, out[-2000:]


def run_final_bench() -> int:
    """Re-capture the headline with the flipped configuration live.
    Streams bench.py (its own budget/resilience machinery applies) and
    mirrors the final JSON line to bench_harvest_out.json."""
    print("== bench.py (post-harvest re-capture)", flush=True)
    proc = subprocess.run([sys.executable, "-u",
                           os.path.join(ROOT, "bench.py")],
                          capture_output=True, text=True, cwd=ROOT)
    sys.stderr.write(proc.stderr[-4000:])
    print(proc.stdout, flush=True)
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if lines:
        with open(os.path.join(ROOT, "bench_harvest_out.json"), "w") as f:
            f.write(lines[-1] + "\n")
    return proc.returncode


def main() -> int:
    wait_hours = None
    for a in sys.argv[1:]:
        if a == "--wait-for-backend":
            wait_hours = 12.0
        elif a.startswith("--wait-for-backend="):
            wait_hours = float(a.split("=")[1])
    if wait_hours is not None:
        if not wait_for_backend(wait_hours):
            return 3

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
        # numeric validation of the flipped configuration (the A/B
        # benches time each kernel in isolation; this compares decoded
        # coordinates end to end) — on failure roll the sidecar back
        print("validating flipped configuration (numeric gate)...",
              flush=True)
        ok, tail = validate_flipped()
        if not ok:
            print("VALIDATION FAILED — rolling back pallas_tuned.json; "
                  f"tail:\n{tail}", flush=True)
            if prev is None:
                os.remove(path)
            else:
                with open(path, "w") as f:
                    f.write(prev)
            return 1
        print(f"validation ok: {tail.strip().splitlines()[-1]}",
              flush=True)

    if failures:
        return 1
    if wait_hours is not None:
        # unattended mode: finish the job — re-capture the headline with
        # the measured winners live
        return run_final_bench()
    return 0


if __name__ == "__main__":
    sys.exit(main())
