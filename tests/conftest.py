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

# Persistent compilation cache: the suite's wall time on this 1-core host
# is dominated by XLA compiles (dozens of distinct jitted programs); with
# a warm cache a full-suite run drops by the whole compile share.  The
# dir is repo-local (gitignored) so `pytest tests/` benefits across
# invocations within a filesystem lifetime.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8
