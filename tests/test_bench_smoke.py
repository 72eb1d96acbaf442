"""Smoke test of the headline bench harness at toy scale: every A/B arm
(warm, cold/no-order, fast-selection) must run end-to-end through the real
run_icp_batch path, and the shared host state must be reusable across arms
— bench.py is the driver's measurement surface, so a regression here
silently breaks the recorded headline."""

import numpy as np

import bench
from icp_variants_tpu.pipeline.config import Selection


def test_bench_arms_run_and_share_state(monkeypatch):
    monkeypatch.setattr(bench, "N_POINTS", 3000)
    monkeypatch.setattr(bench, "N_ITERATIONS", 4)
    monkeypatch.setattr(bench, "BATCH_PAIRS", 2)
    monkeypatch.setattr(bench, "N_TIMED_RUNS", 1)
    pairs = bench.make_pairs()
    state = bench.prepare_host_state(pairs)
    assert state["kd_indexes"] is not None

    dts = {
        "warm": bench.bench_tpu(pairs, Selection.RANDOM, state=state),
        "cold": bench.bench_tpu(
            pairs, Selection.RANDOM, kd_warm_start=False, state=state
        ),
        "fast_warm": bench.bench_tpu(
            pairs, Selection.RANDOM_FAST, state=state
        ),
        # The configuration main() uses when the cold matcher wins.
        "fast_cold": bench.bench_tpu(
            pairs, Selection.RANDOM_FAST, kd_warm_start=False, state=state,
        ),
    }
    for name, dt in dts.items():
        assert np.isfinite(dt) and dt > 0, (name, dt)


def test_dead_backend_reports_instead_of_hanging(monkeypatch, capsys):
    """With the tunnel down the driver's end-of-round bench must emit an
    honest not-measured JSON line and exit nonzero, never hang."""
    import json
    import subprocess

    def probe_times_out(*args, **kwargs):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=1)

    monkeypatch.setattr(subprocess, "run", probe_times_out)
    monkeypatch.delenv("BENCH_SKIP_BACKEND_PROBE", raising=False)
    monkeypatch.setenv("BENCH_BACKEND_WAIT_S", "0")
    rc = bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert out["error"] == "tpu_backend_unreachable"
    assert out["value"] == 0.0
    assert out["metric"] == "eth_scale_scan_pairs_per_sec_chip"


def test_cpu_proxy_runs():
    src, _ = bench.synth_cloud(2000, 0)
    tgt, _ = bench.synth_cloud(2000, 1)
    dt = bench.bench_cpu_proxy(src, tgt)
    assert np.isfinite(dt) and dt > 0
