"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This is the TPU analogue of multi-node testing without a cluster: the same
Mesh/NamedSharding program that runs on an ICI slice executes on 8 host
devices (SURVEY.md section 4 test strategy, item c).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
