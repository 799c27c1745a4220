"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
tests work without a pod (SURVEY.md §4's fake-backend strategy). Must set the
flags before jax initializes a backend, hence module import order matters."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Hard override: this environment pins jax_platforms to "axon,cpu" (the real
# TPU tunnel) in code, ignoring the JAX_PLATFORMS env var — the override must
# go through jax.config before first backend use. Tests run on the virtual
# 8-device CPU mesh unless explicitly opted out with ASQ_TEST_TPU=1.
if os.environ.get("ASQ_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)
