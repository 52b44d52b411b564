"""On-chip Pallas smoke gate wrapper (VERDICT r4 #3).

tests/conftest.py pins the in-process backend to CPU for the whole
suite, so this test re-enables the TPU backend in a SUBPROCESS and runs
``experiments/tpu_smoke.py`` there: one fused FNO train step + one flash
attention call on the real device, finiteness-checked.

Opt-in via ``SCIML_TPU_SMOKE=1`` (the chip may be claimed by a queue
item; grabbing it from an unguarded pytest run would starve the queue) —
queue scripts run the gate directly as a preamble instead.
"""

import os
import pathlib
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu


@pytest.mark.skipif(
    os.environ.get("SCIML_TPU_SMOKE") != "1",
    reason="on-chip gate is opt-in: SCIML_TPU_SMOKE=1 (chip may be claimed)",
)
def test_pallas_kernels_execute_on_chip():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # conftest exported cpu; undo for the child
    env.pop("XLA_FLAGS", None)
    repo = pathlib.Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "experiments" / "tpu_smoke.py")],
        env=env, timeout=1800,
    )
    assert proc.returncode == 0, (
        f"on-chip smoke gate rc={proc.returncode} — see "
        f"experiments/results/tpu_smoke.json"
    )
