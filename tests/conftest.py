"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax initializes (SURVEY.md §4: multi-chip tests via
xla_force_host_platform_device_count).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the image presets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
