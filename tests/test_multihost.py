"""Multi-HOST runtime test: two local CPU processes = two simulated hosts.

The reference's multi-process story is Accelerate DDP/FSDP over NCCL
(train_ddp.py:204-207, train_fsdp.py:248-257); the TPU-native equivalent is
``jax.distributed`` + a hybrid (dcn, data, model) mesh
(``parallel/distributed.py``). No pod is available in CI, so this spawns two
REAL processes (4 virtual CPU devices each, 8 global) and runs one QAT step
and one TP-sharded prefill+decode step whose collectives cross the process
boundary — the cheapest faithful test of the ≥2-host path (VERDICT.md
Next #4).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent
WORKER = Path(__file__).resolve().parent / "multihost_worker.py"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_qat_and_serve():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    # the worker forces CPU via jax.config; scrub test-harness device flags
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=str(REPO),
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert f"MHOK {pid}" in out, f"proc {pid} missing MHOK:\n{out[-4000:]}"
    # both processes computed the SAME global loss (the psum crossed DCN)
    l0 = [l for l in outs[0].splitlines() if l.startswith("MHOK 0")][0]
    l1 = [l for l in outs[1].splitlines() if l.startswith("MHOK 1")][0]
    assert l0.split("loss=")[1] == l1.split("loss=")[1]
