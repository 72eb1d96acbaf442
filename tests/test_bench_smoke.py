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
    assert state["query_orders"].shape == (2, 3072)  # capacity-padded rows

    dts = {
        "warm": bench.bench_tpu(
            pairs, Selection.RANDOM, warm=True, state=state
        ),
        "cold": bench.bench_tpu(
            pairs, Selection.RANDOM, warm=False, qorder=False, state=state
        ),
        "fast": bench.bench_tpu(pairs, Selection.RANDOM_FAST, state=state),
    }
    for name, dt in dts.items():
        assert np.isfinite(dt) and dt > 0, (name, dt)


def test_cpu_proxy_runs():
    src, _, tgt, _ = (
        bench.synth_cloud(2000, 0)[0],
        None,
        bench.synth_cloud(2000, 1)[0],
        None,
    )
    dt = bench.bench_cpu_proxy(src, tgt)
    assert np.isfinite(dt) and dt > 0
