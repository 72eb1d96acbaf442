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


def test_pinned_proxy_denominator():
    """vs_baseline divides by the PINNED proxy (BASELINE.json) unless the
    fresh proxy is even faster — host contention must never inflate the
    ratio (VERDICT r3: 6.68x vs 8.4x on identical device throughput was
    pure proxy variance)."""
    pins = bench.load_pinned_proxy()
    assert "eth_proxy_seconds_per_pair" in pins
    pin = pins["eth_proxy_seconds_per_pair"]
    out = {}
    # Contention-slowed fresh proxy: the pin wins.
    assert bench.proxy_denominator(
        pins, "eth_proxy_seconds_per_pair", pin * 2, out, "eth") == pin
    assert out["eth_fresh_proxy_s"] == round(pin * 2, 4)
    assert out["eth_pinned_proxy_s"] == pin
    # Quieter-than-ever fresh proxy: tightens the denominator.
    assert bench.proxy_denominator(
        pins, "eth_proxy_seconds_per_pair", pin / 2, out, "eth") == pin / 2
    # Unknown config degrades to the fresh measurement.
    assert bench.proxy_denominator(pins, "nope", 1.23, out, "x") == 1.23


def test_cpu_proxy_runs():
    src, _ = bench.synth_cloud(2000, 0)
    tgt, _ = bench.synth_cloud(2000, 1)
    dt = bench.bench_cpu_proxy(src, tgt)
    assert np.isfinite(dt) and dt > 0


def test_tum_sections_run_at_toy_scale(monkeypatch):
    """The TUM projective and color-multires bench sections (BASELINE.json
    configs 2 and 4) must run end-to-end through run_icp_batch, and their
    CPU proxies must produce finite times."""
    monkeypatch.setattr(bench, "TUM_W", 64)
    monkeypatch.setattr(bench, "TUM_H", 48)
    monkeypatch.setattr(bench, "TUM_FX", 525.0 * 64 / 640)
    monkeypatch.setattr(bench, "TUM_FY", 525.0 * 64 / 640)
    monkeypatch.setattr(bench, "TUM_CX", (64 - 1) / 2)
    monkeypatch.setattr(bench, "TUM_CY", (48 - 1) / 2)
    monkeypatch.setattr(bench, "TUM_ITERATIONS", 3)
    monkeypatch.setattr(bench, "TUM_BATCH_FRAMES", 2)
    state = bench.prepare_tum_state()
    # The depth solve must produce mostly-valid backprojections.
    assert np.asarray(state["targets_img"].valid[0]).mean() > 0.8
    for fn in (
        bench.bench_tum_projective,
        bench.bench_color_multires,
        bench.bench_cpu_proxy_projective,
        bench.bench_cpu_proxy_color_multires,
    ):
        dt = fn(state)
        assert np.isfinite(dt) and dt > 0, fn.__name__


def test_indoor_pairs_are_harder_but_valid(monkeypatch):
    """The hard synthetic ETH family: finite unit normals, the intended
    partial overlap, and multi-surface structure (distinct normal
    directions)."""
    monkeypatch.setattr(bench, "N_POINTS", 4000)
    monkeypatch.setattr(bench, "BATCH_PAIRS", 2)
    pairs = bench.make_indoor_pairs()
    assert len(pairs) == 2
    for sp, sn, tp, tn in pairs:
        assert sp.shape == (4000, 3) and tp.shape == (4000, 3)
        assert np.isfinite(sp).all() and np.isfinite(tn).all()
        assert abs(np.linalg.norm(sn, axis=1) - 1).max() < 1e-3
        # Multi-surface: at least 3 distinct dominant normal directions.
        dirs = np.unique(np.round(np.abs(tn)).astype(int), axis=0)
        assert len(dirs) >= 3
        # Partial overlap: some target x-range has no source coverage.
        assert tp[:, 0].min() < sp[:, 0].min() - 1.0
