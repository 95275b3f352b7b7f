"""Execution-mode switch for the Pallas kernels.

The kernels (flash_attention, fused_mlp, fused_attn_block) are Mosaic/TPU
programs; off-TPU they run through the Pallas interpreter so that any code
path that explicitly enables them (e.g. mesh-sharding tests on the
8-device virtual CPU mesh) stays correct instead of crashing. On TPU the
compiled kernel is always used unless a test forces interpretation.
"""

from __future__ import annotations

from typing import Optional

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


_ENCODER_STACK: Optional[bool] = None


def set_encoder_stack(value: Optional[bool]) -> None:
    """Override the whole-encoder-in-one-kernel path (None = default).

    Trace-time switch: functions already jitted keep the path they were
    traced with — set it before the first call (or re-jit) when A/B'ing.
    """
    global _ENCODER_STACK
    _ENCODER_STACK = value


def encoder_stack_default() -> bool:
    """True when the eval path should run ALL encoder layers in one
    Pallas program (fused_encoder_stack) instead of one program per
    layer. Bit-identical either way; this is purely a measured-perf
    switch (scripts/bench_encoder_stack.py), overridable via
    EDGECAPE_ENC_STACK=0/1 for A/B timing without code edits."""
    if _ENCODER_STACK is not None:
        return _ENCODER_STACK
    import os
    env = os.environ.get("EDGECAPE_ENC_STACK")
    if env is not None:
        return env not in ("0", "false", "False")
    return False  # pending measurement on hardware (round-4 build)


_DECODER_STACK: Optional[bool] = None


def set_decoder_stack(value: Optional[bool]) -> None:
    """Override the whole-decoder-in-Pallas path (None = default).

    Trace-time switch: functions already jitted keep the path they were
    traced with — set it before the first call (or re-jit) when A/B'ing.
    """
    global _DECODER_STACK
    _DECODER_STACK = value


def decoder_stack_default() -> bool:
    """True when the eval path should run the refinement decoder as
    VMEM-resident layer chunks with all inter-layer glue in-kernel
    (ops/fused_decoder.fused_decoder_stack) instead of one Pallas
    program per layer with the glue in XLA. Tolerance-equal (not
    bit-exact — see the fused_decoder module docstring); measured-perf
    switch, overridable via EDGECAPE_DEC_STACK=0/1."""
    if _DECODER_STACK is not None:
        return _DECODER_STACK
    import os
    env = os.environ.get("EDGECAPE_DEC_STACK")
    if env is not None:
        return env not in ("0", "false", "False")
    return False  # pending measurement on hardware (round-4 build)
