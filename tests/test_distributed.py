"""Two-process CPU cluster: distributed_init + global mesh + collectives.

The multi-host (DCN) story without a pod: two OS processes, each owning 2
virtual CPU devices, join through ``jax.distributed.initialize`` and run
the SAME jitted reduction over a global 4-device mesh —
``host_local_array`` assembles each process's half of the batch into one
global array (SURVEY.md section 2.6).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from sciml_pde_tpu.parallel import (
        distributed_init, host_local_array, make_mesh, replicate,
    )

    coord, pid = sys.argv[1], int(sys.argv[2])
    distributed_init(coordinator_address=coord, num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())
    assert len(jax.local_devices()) == 2

    mesh = make_mesh()          # global 4x1 ('data','model') mesh
    assert dict(mesh.shape) == {"data": 4, "model": 1}

    # global batch 8, each process contributes its local half (4 rows)
    local = np.full((4, 3), float(pid + 1), np.float32)
    g = host_local_array(local, mesh)
    assert g.shape == (8, 3)

    total = jax.jit(lambda a: a.sum())(g)
    # rows: 4*1 + 4*2 = 12 per column, 3 columns -> 36
    assert float(total) == 36.0, float(total)
    print(f"proc {pid} ok total={float(total)}")
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cpu_cluster(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    env = dict(os.environ)
    # sitecustomize registers the TPU PJRT plugin (initialising the XLA
    # backend) whenever PALLAS_AXON_POOL_IPS is set, which would forbid a
    # later jax.distributed.initialize — strip it for the CPU workers
    for k in list(env):
        if k.startswith(("PALLAS_AXON", "AXON_")):
            env.pop(k)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split() if "device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=2"])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} ok" in out
