"""Execution-mode switches for the Pallas kernels.

The kernels (flash_attention, fused_mlp, fused_attn_block) are Mosaic/TPU
programs; off-TPU they run through the Pallas interpreter so that any code
path that explicitly enables them (e.g. mesh-sharding tests on the
8-device virtual CPU mesh) stays correct instead of crashing. On TPU the
compiled kernel is always used unless a test forces interpretation.

Kernel VARIANT switches (encoder stack, decoder stack, ViT pair-blocks)
are measured-perf decisions, not correctness ones. Their precedence:

1. an explicit set_<name>(bool) in-process override,
2. the EDGECAPE_<NAME> environment variable (A/B timing without edits),
3. `pallas_tuned.json` at the repo root — written by
   scripts/measure_round4.py from on-hardware A/B timings so measured
   winners persist across processes (bench.py children, serve replicas)
   without code edits,
4. the conservative code default (False — the chained forms, which are
   the hardware-validated round-3 configuration).

All of these are TRACE-TIME switches: functions already jitted keep the
path they were traced with — set them before the first call (or re-jit)
when A/B'ing.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax

_FORCE_INTERPRET: Optional[bool] = None


def set_interpret(value: Optional[bool]) -> None:
    """Override kernel interpretation globally (None = auto by backend)."""
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = value


def interpret_default() -> bool:
    """True when kernels should run through the Pallas interpreter."""
    if _FORCE_INTERPRET is not None:
        return _FORCE_INTERPRET
    return jax.default_backend() != "tpu"


_TUNED: Optional[Dict[str, bool]] = None


def tuned_path() -> str:
    """Location of the measured-defaults sidecar (overridable for
    tests via EDGECAPE_PALLAS_TUNED)."""
    env = os.environ.get("EDGECAPE_PALLAS_TUNED")
    if env:
        return env
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "pallas_tuned.json")


def _tuned() -> Dict[str, bool]:
    global _TUNED
    if _TUNED is None:
        try:
            with open(tuned_path()) as f:
                data = json.load(f)
            _TUNED = {k: bool(v) for k, v in
                      data.get("switches", {}).items()}
        except (OSError, ValueError):
            _TUNED = {}
    return _TUNED


def reload_tuned() -> None:
    """Drop the cached pallas_tuned.json (tests / post-measurement)."""
    global _TUNED
    _TUNED = None


_OVERRIDES: Dict[str, Optional[bool]] = {}


def _switch(name: str, env_var: str) -> bool:
    ov = _OVERRIDES.get(name)
    if ov is not None:
        return ov
    env = os.environ.get(env_var)
    if env is not None:
        return env not in ("0", "false", "False")
    tuned = _tuned().get(name)
    if tuned is not None:
        return tuned
    return False


def set_encoder_stack(value: Optional[bool]) -> None:
    """Override the whole-encoder-in-one-kernel path (None = default).
    Trace-time switch — see the module docstring."""
    _OVERRIDES["encoder_stack"] = value


def encoder_stack_default() -> bool:
    """True when the eval path should run ALL encoder layers in one
    Pallas program (fused_encoder_stack) instead of one program per
    layer. Bit-identical either way; purely a measured-perf switch
    (scripts/bench_encoder_stack.py). Env: EDGECAPE_ENC_STACK."""
    return _switch("encoder_stack", "EDGECAPE_ENC_STACK")


def set_decoder_stack(value: Optional[bool]) -> None:
    """Override the whole-decoder-in-Pallas path (None = default).
    Trace-time switch — see the module docstring."""
    _OVERRIDES["decoder_stack"] = value


def decoder_stack_default() -> bool:
    """True when the eval path should run the refinement decoder as
    VMEM-resident layer chunks with all inter-layer glue in-kernel
    (ops/fused_decoder.fused_decoder_stack) instead of one Pallas
    program per layer with the glue in XLA. Tolerance-equal (not
    bit-exact — see the fused_decoder module docstring); measured-perf
    switch (scripts/bench_decoder_stack.py). Env: EDGECAPE_DEC_STACK."""
    return _switch("decoder_stack", "EDGECAPE_DEC_STACK")


def set_vit_pair_blocks(value: Optional[bool]) -> None:
    """Override the two-ViT-blocks-per-program backbone path (None =
    default). Trace-time switch — see the module docstring."""
    _OVERRIDES["vit_pair_blocks"] = value


def vit_pair_blocks_default() -> bool:
    """True when the fused backbone should run two consecutive ViT
    blocks per Pallas program (ops/fused_vit_block.fused_vit_block2 —
    half the program count, double the MXU chain). Bit-identical to
    the one-block-per-program form; measured-perf switch
    (scripts/bench_backbone_pair.py). Env: EDGECAPE_VIT_PAIR."""
    return _switch("vit_pair_blocks", "EDGECAPE_VIT_PAIR")
