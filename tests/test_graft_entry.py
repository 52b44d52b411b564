"""The driver's entry points must work under every invocation mode.

``dryrun_multichip`` burned round 1's MULTICHIP artifact on a bootstrap
bug (it trusted ``jax.devices()`` while the TPU tunnel was down) and
nearly round 2's on a second one (it trusted ``JAX_PLATFORMS=cpu`` env,
which this environment's sitecustomize clobbers with an unconditional
``jax.config.update('jax_platforms', 'axon,cpu')``).  These tests pin
the two cheap invariants; the full subprocess path is exercised by the
slow test at the bottom.
"""

import subprocess
import sys

import jax
import numpy as np
import pytest


def test_entry_compiles_single_device():
    import __graft_entry__ as g

    fn, (x, grid) = g.entry()
    out = jax.jit(fn)(x, grid)
    assert out.shape == (4, 128, 128, 1, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_inline_on_conftest_mesh():
    """Under tests/conftest.py jax is already pinned to an 8-device CPU
    platform, so the entry point must run inline (no subprocess)."""
    import __graft_entry__ as g

    called = {}
    orig = g._dryrun_multichip_impl
    g._dryrun_multichip_impl = lambda n: called.setdefault("n", n)
    try:
        g.dryrun_multichip(8)
    finally:
        g._dryrun_multichip_impl = orig
    assert called == {"n": 8}


def test_dryrun_env_shortcut_never_trusted(monkeypatch):
    """With JAX_PLATFORMS=cpu in env but jax NOT pinned to cpu, the entry
    point must re-exec (env vars are clobbered by sitecustomize) rather
    than touch the possibly-axon backend in-process."""
    import __graft_entry__ as g

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    monkeypatch.delenv("_SCIML_DRYRUN_SPAWNED", raising=False)

    class _FakeConfig:
        jax_platforms = "axon,cpu"  # what sitecustomize's register() leaves

    class _FakeJax:
        config = _FakeConfig()

    monkeypatch.setitem(sys.modules, "jax", _FakeJax())
    spawned = {}

    def fake_run(cmd, cwd=None, env=None):
        spawned["env"] = env
        return subprocess.CompletedProcess(cmd, 0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    g.dryrun_multichip(8)
    assert spawned, "expected a subprocess re-exec, got inline execution"
    assert spawned["env"]["_SCIML_DRYRUN_SPAWNED"] == "1"


@pytest.mark.slow
def test_dryrun_full_subprocess_bootstrap(tmp_path):
    """End-to-end: a bare interpreter with no platform env vars must
    bootstrap the virtual mesh itself (the exact driver invocation)."""
    code = "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK')"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout
