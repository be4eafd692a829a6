"""2-process jax.distributed execution on CPU (gloo collectives).

The reference is strictly single-node (SURVEY.md section 2.6); this test
proves the scale-out wiring: two OS processes form one JAX slice, the DB
rows partition by process, and the membership reduction's modular psum
runs across the process boundary."""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_psum_mod():
    worker = os.path.join(os.path.dirname(__file__), "_mh_worker.py")
    port = _free_port()
    env = dict(os.environ)
    # keep each worker small: 2 virtual CPU devices per process
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(rank), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.join(os.path.dirname(__file__), ".."), text=True)
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"MULTIHOST-OK rank={rank}" in out, out
