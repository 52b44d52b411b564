"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This is the TPU analogue of multi-node testing without a cluster: the same
Mesh/NamedSharding program that runs on an ICI slice executes on 8 host
devices (SURVEY.md section 4 test strategy, item c).

Note: this environment pre-imports jax at interpreter startup (sitecustomize
registers the TPU PJRT plugin), so env vars alone are too late —
``jax.config.update`` is the reliable switch.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8
