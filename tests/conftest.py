"""Test harness: force an 8-device virtual CPU mesh.

This is the TPU-world "fake backend" the reference never needed
(SURVEY.md §4): all sharding/collective paths are exercised on 8 virtual CPU
devices, so the suite runs anywhere and never grabs a real TPU chip.

Note: environments that pre-register a TPU plugin via sitecustomize may
override ``JAX_PLATFORMS`` programmatically, so we both set the env var and
force the config back to cpu after importing jax.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
