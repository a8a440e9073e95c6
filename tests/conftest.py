"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware by forcing the
CPU platform with 8 virtual devices (the TPU-native analogue of the
reference's untestable NCCL paths; see SURVEY.md section 4).

The environment may pre-register a remote TPU backend and point
``JAX_PLATFORMS`` at it, so both the env var and ``jax.config`` are forced —
tests must never silently run over a device tunnel.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert all(d.platform == "cpu" for d in jax.devices()), jax.devices()
assert jax.device_count() == 8, jax.devices()
