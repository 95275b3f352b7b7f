"""Runtime/platform helpers shared by the CLIs."""

from __future__ import annotations

import os


def honor_env_platforms() -> None:
    """Make JAX_PLATFORMS from the environment effective.

    Some images bake jax_platforms (e.g. 'axon,cpu') into the jax config
    file, which silently overrides the JAX_PLATFORMS environment variable.
    The CLIs call this before first device use so `JAX_PLATFORMS=cpu
    python train.py ...` behaves as documented (and so a CPU-only machine
    can drive the full pipeline).
    """
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        import jax
        jax.config.update("jax_platforms", env_platforms)
