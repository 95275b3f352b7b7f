"""Test config: force an 8-device virtual CPU platform so multi-chip
sharding paths are exercised without TPU hardware.

The ambient environment may point JAX at a tunneled TPU (JAX_PLATFORMS=axon)
and some installed pytest plugin imports jax before this conftest runs, so
setting os.environ alone is not enough — we also override the already-read
jax config. Backends initialize lazily, so this is safe as long as no
plugin has touched jax.devices() yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# isolate tests from a measured pallas_tuned.json at the repo root
# (tests pin kernel variants explicitly via pallas_config setters)
os.environ.setdefault("EDGECAPE_PALLAS_TUNED", "/nonexistent")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except AttributeError:  # older jax: XLA_FLAGS path above covers it
    pass
