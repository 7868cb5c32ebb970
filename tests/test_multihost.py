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


def _run_children(extra_args=()):
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(repo, "tests", "multihost_child.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(i), "2", str(port), *extra_args],
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
    return outs


def test_two_process_train_step_agrees():
    outs = _run_children()

    losses = []
    for out in outs:
        line = next(ln for ln in out.splitlines() if ln.startswith("MHLOSS"))
        losses.append(float(line.split()[1]))
        assert line.split()[3] == "1"
    assert losses[0] == losses[1], losses
    assert all(abs(v) < 1e6 for v in losses)


def test_two_process_fit_single_writer(tmp_path):
    """A short REAL fit() across 2 processes + shared snapshot dir: the
    epoch-plan fingerprint check passes, both processes compute the same
    validation CER (plateau lr stays in sync), and only process 0 writes
    — each metrics step record appears exactly once and one last/ exists
    (train.py multi-host discipline; SURVEY.md §5 distributed row)."""
    import json

    from vistaocr_tpu.data import build_synthetic_dataset
    from vistaocr_tpu.data.synth import SynthConfig

    data = tmp_path / "data"
    snap = tmp_path / "snap"
    cfg = SynthConfig(language="charset", charset="abcdeo ", min_words=1,
                      max_words=3)
    build_synthetic_dataset(
        str(data), num_train=96, num_val=24, height=32, max_width=384,
        config=cfg, seed=11,
    )
    outs = _run_children(("fit", str(data), str(snap)))

    lines = []
    for out in outs:
        line = next(ln for ln in out.splitlines() if ln.startswith("MHFIT"))
        lines.append(dict(kv.split("=") for kv in line.split()[1:]))
    assert lines[0]["steps"] == lines[1]["steps"] == "10"
    assert lines[0]["cer"] == lines[1]["cer"], lines
    assert sorted(l["pid"] for l in lines) == ["0", "1"]

    # exactly one writer: snapshot exists, and no (step, record-kind) is
    # written twice — two unguarded processes would duplicate every record
    assert (snap / "last" / "meta.json").exists()
    recs = [
        json.loads(ln)
        for ln in (snap / "metrics.jsonl").read_text().splitlines()
    ]
    keys = [(r["step"], "val_cer" in r) for r in recs]
    assert len(keys) == len(set(keys)), keys
