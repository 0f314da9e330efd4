"""Multi-host pattern (SURVEY §4): the coefficient-sharded pipeline runs
across 2 jax.distributed processes (4 virtual CPU devices each) and
matches the single-process result.

Spawns the workers as subprocesses so the coordinator/client runtime is
exercised for real; skipped automatically if the spawn environment can't
initialize (e.g. no free port)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_pipeline():
    port = _free_port()
    workers = []
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_multihost_worker.py")
    for pid in range(2):
        workers.append(subprocess.Popen(
            [sys.executable, script, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env))
    outs = []
    try:
        for w in workers:
            out, _ = w.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for w in workers:
            w.kill()
        pytest.fail("multihost workers timed out")
    for pid, (w, out) in enumerate(zip(workers, outs)):
        assert w.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK pid={pid}" in out
