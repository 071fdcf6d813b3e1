"""Test configuration: run everything on a virtual 8-device CPU mesh.

The image's sitecustomize registers the axon TPU plugin and force-sets
jax_platforms="axon,cpu" via jax.config.update at interpreter start, so the
JAX_PLATFORMS env var alone is not enough — we must update the config back
before any backend initializes (SURVEY.md §4: multi-chip tests via
xla_force_host_platform_device_count).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.device_count() == 8, (
    f"tests require 8 virtual CPU devices, got {jax.device_count()} "
    f"on {jax.default_backend()}"
)

# Persistent compilation cache: repeat suite runs skip the CPU compiles
# (the fused-pipeline tests pay multi-minute model compiles otherwise).
from cm3d_tpu.utils.jax_setup import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
