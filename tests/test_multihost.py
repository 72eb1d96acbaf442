"""2-process CPU rehearsal of the multi-host (jax.distributed) path.

The pod target (>= 80% scaling on 2 hosts, BASELINE.json north_star) cannot
be measured on one chip; this verifies the CODE PATH: cross-process runtime
bring-up, a global mesh spanning both processes, and a sharded ICP step
whose pair shards live on different processes.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multihost_rehearsal.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_pod_scaling_harness_rehearsal():
    """The pod scaling-efficiency harness (scripts/pod_scaling_bench.py)
    must run unmodified at 1 and 2 processes and report pairs/s/host JSON
    from the coordinator — the measurement the >= 80%-on-2-hosts target
    (BASELINE.json) is computed from on a real pod."""
    import json

    script = os.path.join(REPO, "scripts", "pod_scaling_bench.py")
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    single = subprocess.run(
        [sys.executable, script, "--single", "--toy",
         "--pairs-per-host", "4", "--runs", "1"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert single.returncode == 0, single.stdout + single.stderr
    rep1 = json.loads(single.stdout.strip().splitlines()[-1])
    assert rep1["world"] == 1 and rep1["pairs_per_sec_per_host"] > 0

    port = str(_free_port())
    procs = [
        subprocess.Popen(
            [sys.executable, script, "--coordinator", f"127.0.0.1:{port}",
             "--nprocs", "2", "--proc-id", str(rank), "--toy",
             "--pairs-per-host", "4", "--runs", "1"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for rank in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=280)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("pod scaling rehearsal timed out:\n" + "\n".join(outs))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
    rep2 = json.loads(outs[0].strip().splitlines()[-1])
    assert rep2["world"] == 2 and rep2["pairs"] == 8
    assert rep2["pairs_per_sec_per_host"] > 0


def test_two_process_rehearsal():
    port = str(_free_port())
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, SCRIPT, str(rank), "2", port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for rank in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-host rehearsal timed out:\n" + "\n".join(outs))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert "REHEARSAL OK" in out, out
