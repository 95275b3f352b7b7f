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
