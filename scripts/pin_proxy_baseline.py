"""Pin the CPU-proxy baseline denominators into BASELINE.json.

The bench's `vs_baseline` divides the TPU throughput by a scipy/numpy proxy
of the reference's hot loop (FLANN kd query + Eigen solve, bench.py). The
proxy runs on a SHARED host, so re-measuring it at capture time made the
north-star pass/fail swing ~25% with host load (VERDICT r3: 6.68x vs 8.4x
on identical 12.4 pairs/s device throughput). Fix: persist each config's
best-ever (fastest = most conservative) proxy time here, once, and have
bench.py divide by the PIN; the fresh proxy is still printed for drift
detection and the pin auto-tightens if a fresh run beats it.

Usage: python scripts/pin_proxy_baseline.py [reps]
Re-running only ever LOWERS the pinned times (min-merge), so it is safe to
run on any host state; a quiet host tightens the pin, a loaded host is a
no-op. Historical bests from the r3 captures are seeded as upper bounds.
"""

from __future__ import annotations

import json
import pathlib
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # host-only: never touch the TPU

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402

# Best-ever proxy seconds derived from the round-3 captures (device rate /
# vs_baseline from BENCH_r03.json and scripts/evidence/bench_r3_final2.txt). These
# seed the pin so it can only tighten from the historical record.
HISTORICAL_BEST = {
    "eth_proxy_seconds_per_pair": 6.68 / 12.4826,
    "eth_indoor_proxy_seconds_per_pair": 4.746 / 9.5006,
    "tum_projective_proxy_seconds_per_frame": 10.275 / 1.1163,
    "color_multires_proxy_seconds_per_frame": 1.85 / 0.338,
}


def measure(reps: int) -> dict:
    print(f"measuring CPU proxies, {reps} reps each", flush=True)
    pairs = bench.make_pairs()
    src, _, tgt, _ = pairs[0]
    eth = min(bench.bench_cpu_proxy(src, tgt) for _ in range(reps))
    print(f"  eth proxy: {eth:.4f} s/pair", flush=True)

    ipairs = bench.make_indoor_pairs()
    isrc, _, itgt, _ = ipairs[0]
    indoor = min(bench.bench_cpu_proxy(isrc, itgt) for _ in range(reps))
    print(f"  eth_indoor proxy: {indoor:.4f} s/pair", flush=True)

    tum_state = bench.prepare_tum_state()
    proj = min(
        bench.bench_cpu_proxy_projective(tum_state) for _ in range(reps)
    )
    print(f"  tum_projective proxy: {proj:.4f} s/frame", flush=True)
    color = min(
        bench.bench_cpu_proxy_color_multires(tum_state) for _ in range(reps)
    )
    print(f"  color_multires proxy: {color:.4f} s/frame", flush=True)
    return {
        "eth_proxy_seconds_per_pair": eth,
        "eth_indoor_proxy_seconds_per_pair": indoor,
        "tum_projective_proxy_seconds_per_frame": proj,
        "color_multires_proxy_seconds_per_frame": color,
    }


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    fresh = measure(reps)
    path = REPO / "BASELINE.json"
    data = json.loads(path.read_text())
    pinned = dict(data.get("pinned_proxy", {}))
    for key, hist in HISTORICAL_BEST.items():
        candidates = [hist, fresh[key]]
        if key in pinned:
            candidates.append(pinned[key])
        pinned[key] = round(min(candidates), 4)
    data["pinned_proxy"] = pinned
    data["pinned_proxy_note"] = (
        "Fastest-ever CPU proxy seconds (scripts/pin_proxy_baseline.py; "
        "min-merged across runs + the r3 historical captures). bench.py "
        "divides device time by these pins so vs_baseline is stable "
        "against host contention; fresh proxies are reported for drift."
    )
    path.write_text(json.dumps(data, indent=2) + "\n")
    print(json.dumps(pinned, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
