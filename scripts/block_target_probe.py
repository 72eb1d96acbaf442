"""Hardware sweep: kd block size vs approximate-arm throughput.

The approximate arm's candidate budget rounds up to whole kd blocks
(kdtree.checks_to_k), so the block capacity IS the budget floor — at the
round-4 default (768-pt blocks) a checks=16 query evaluates a ~600-714
point block. Smaller blocks cut the k-capped kernels' per-query vector
work (tile_t lanes per member block) at the price of a wider prefix
ranking (lb width = block count) and more member blocks per gate walk.
This probe measures the end-to-end trade on the real chip for the two
configs the verdict flagged:

- ETH headline (365k pts, checks=16): block_target 768 / 384 / 192
  (192 exceeds the one-block-per-page VMEM budget and exercises the
  packed two-blocks-per-page fallback, d=3 only).
- TUM color-multires (6-dim, 307k pts, checks=16): 768 / 384 (d=6 has
  no packed layout; 192 would blow the VMEM budget).

Usage: python scripts/block_target_probe.py [eth|color|both]
Appends to scripts/evidence/block_target_probe.txt (flush+fsync so the
buffered background shell can be polled).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "evidence", "block_target_probe.txt")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line)
    with open(LOG, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    import bench
    from icp_variants_tpu.pipeline.config import Selection

    log(f"=== block_target probe start ({which}) ===")

    if which in ("eth", "both"):
        pairs = bench.make_pairs()
        for bt in (768, 384, 192):
            t0 = time.time()
            state = bench.prepare_host_state(pairs, block_target=bt)
            idx = state["kd_indexes"]
            nc, cap = idx.block_orig.shape[1], idx.block_orig.shape[2]
            tile_t = idx.pages.shape[3]
            log(f"eth bt={bt}: nc={nc} cap={cap} tile_t={tile_t} "
                f"(host prep {time.time()-t0:.0f}s)")
            dt = bench.bench_tpu(
                pairs, Selection.RANDOM, state=state,
                matching_checks=16, kd_block_target=bt)
            log(f"eth checks16 bt={bt}: {1.0/dt:.2f} pairs/s")
            if bt in (768, 384):
                dt_e = bench.bench_tpu(
                    pairs, Selection.RANDOM, state=state,
                    kd_block_target=bt)
                log(f"eth exact    bt={bt}: {1.0/dt_e:.2f} pairs/s")

    if which in ("color", "both"):
        tum_state = bench.prepare_tum_state()
        for bt in (768, 384):
            dt = bench.bench_color_multires(
                tum_state, matching_checks=16, kd_block_target=bt)
            log(f"color checks16 bt={bt}: {1.0/dt:.3f} frames/s")

    log("=== block_target probe done ===")


if __name__ == "__main__":
    main()
