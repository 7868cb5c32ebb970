"""Multi-host data parallelism (SURVEY.md §5 distributed backend row):
two REAL processes join a jax.distributed cluster over loopback (gloo
CPU collectives), form one 8-device mesh (4 virtual CPU devices per
process), and run one sharded train step. GSPMD's gradient all-reduce
crosses the process boundary; both processes must report the same loss.

This is the strongest multi-host evidence obtainable without a second
machine — the same initialize()+mesh path `train.py
--coordinator-address` and bench's BENCH_COORDINATOR_ADDRESS use.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_step_agrees():
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(repo, "tests", "multihost_child.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(i), "2", str(port)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host child timed out")
        assert p.returncode == 0, f"child failed:\n{err[-2000:]}"
        outs.append(out)

    losses = []
    for out in outs:
        line = next(ln for ln in out.splitlines() if ln.startswith("MHLOSS"))
        losses.append(float(line.split()[1]))
        assert line.split()[3] == "1"
    assert losses[0] == losses[1], losses
    assert all(abs(v) < 1e6 for v in losses)
