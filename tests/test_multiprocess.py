"""Multi-process distributed execution proof (2 × jax.distributed).

Parity target: the reference's MPI transport is inherently
multi-process (caput mpiarray; SURVEY §1 L3).  The actual programs and
assertions live in tools/multiprocess_proof.py — two OS processes with
4 virtual CPU devices each run the cross-process all-to-all synthesis
and the orbax sharded-save / resharded-restore, asserting equality
against a single-device reference.
"""

import os
import subprocess
import sys

import pytest

pytest.importorskip("orbax.checkpoint")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_distributed_proof():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multiprocess_proof.py")],
        capture_output=True, text=True, timeout=480,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ok=True" in r.stdout
