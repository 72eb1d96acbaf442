"""Host probe for EXACT color pruning (round-4 verdict task 3): would
splitting each 6-dim kd block's members into color sub-boxes (extra bounds
rows in the page table, same pages) shrink the gated candidate width of
the dense TUM color-multires matcher?

The 6-dim lower bound is spatial-box lb + color-box lb; block color boxes
span most of [0,1] (ROADMAP "Known headroom"), so the color term is ~0 and
6-dim membership is ~10x wider than 3-dim. If per-sub-box color bounds cut
the candidate width >= 2x, a kernel change ships; otherwise the finding
justifies the approximate arm carrying config 4.

Pure host numpy on the synthetic TUM frame (bench shapes). Appends to
scripts/evidence/color_subbox_probe.txt.
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
LOG = os.path.join(REPO, "scripts", "evidence", "color_subbox_probe.txt")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


def box_lb(q, bmin, bmax):
    """(N, D) x (M, D) -> (N, M) squared box lower bounds."""
    lb = np.zeros((q.shape[0], bmin.shape[0]), np.float32)
    for j in range(q.shape[1]):
        gap = np.maximum(
            np.maximum(bmin[None, :, j] - q[:, j:j + 1],
                       q[:, j:j + 1] - bmax[None, :, j]), 0.0)
        lb += gap * gap
    return lb


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import bench
    from icp_variants_tpu.ops import kdtree, knn

    MAXD = bench.TUM_MAX_DISTANCE  # 0.1 squared threshold
    state = bench.prepare_tum_state()
    tgt = state["targets_cmp"]
    tok = np.asarray(tgt.valid[0])
    tfeat = np.asarray(knn.color_features(tgt.points[0], tgt.colors[0]))
    src = state["sources_full"]
    sfeat = np.asarray(knn.color_features(src.points[0], src.colors[0]))
    sok = np.asarray(src.valid[0])

    idx = kdtree.build_kd_index(tfeat, tok)
    nc, cap = idx.block_orig.shape
    bmin = np.asarray(idx.block_min)
    bmax = np.asarray(idx.block_max)
    borig = np.asarray(idx.block_orig)
    log(f"=== color sub-box probe: nc={nc} cap={cap} maxd={MAXD} ===")
    occupied = borig >= 0
    counts = occupied.sum(1)
    cspan = (bmax[:, 3:] - bmin[:, 3:])
    sspan = (bmax[:, :3] - bmin[:, :3])
    valid_blocks = counts > 0
    log(f"block color-box span (mean per dim): "
        f"{cspan[valid_blocks].mean(0).round(3)} | spatial "
        f"{sspan[valid_blocks].mean(0).round(3)}")

    # Query tiles: 128 consecutive raster rows (the dense SELECT_ALL tile
    # structure), a representative mid-image slab.
    TILE = 128
    K = 4
    start = (bench.TUM_W * bench.TUM_H) // 3
    n_q = 16384
    rows = np.arange(start, start + n_q)
    q = sfeat[rows]
    qok = sok[rows]
    nqt = n_q // TILE

    # Per-query top-K membership by 6-dim lb (the prefix kernel's rule),
    # intersected with the radius.
    lb = box_lb(q, bmin, bmax)
    lb[~qok] = np.inf
    lb[:, ~valid_blocks] = np.inf
    order = np.argsort(lb, axis=1)[:, :K]
    topk_lb = np.take_along_axis(lb, order, axis=1)
    member_q = topk_lb <= MAXD * (1 + 1e-6)

    # Current kernel cost model: per tile, the union of member blocks;
    # every (gate-group) query row pays cap lanes per member block.
    cur_blocks_per_tile = []
    for t in range(nqt):
        sel = order[t * TILE:(t + 1) * TILE][
            member_q[t * TILE:(t + 1) * TILE]]
        cur_blocks_per_tile.append(len(np.unique(sel)))
    cur_blocks_per_tile = np.asarray(cur_blocks_per_tile)
    log(f"current: member blocks/tile mean {cur_blocks_per_tile.mean():.1f} "
        f"(p90 {np.percentile(cur_blocks_per_tile, 90):.0f}) "
        f"-> candidates/query ~ {cur_blocks_per_tile.mean() * cap:.0f}")

    # Sub-box variant: split each block's members into S groups along its
    # widest COLOR axis (members sorted, equal splits); each sub-box has
    # its own full 6-dim bbox. Exactness: membership per query becomes
    # any sub-box with lb_sub <= bound among its top-K blocks' subs.
    for S in (2, 4, 8):
        sub_min = np.full((nc, S, 6), np.inf, np.float32)
        sub_max = np.full((nc, S, 6), -np.inf, np.float32)
        sub_cnt = np.zeros((nc, S), np.int64)
        for b in range(nc):
            rows_b = borig[b][occupied[b]]
            if len(rows_b) == 0:
                continue
            f = tfeat[rows_b]
            ax = 3 + int(np.argmax(f[:, 3:].max(0) - f[:, 3:].min(0)))
            srt = np.argsort(f[:, ax])
            for s, part in enumerate(np.array_split(srt, S)):
                if len(part) == 0:
                    continue
                sub_min[b, s] = f[part].min(0)
                sub_max[b, s] = f[part].max(0)
                sub_cnt[b, s] = len(part)
        # Candidate widths at THREE gating granularities: tile union (128
        # rows — the coarsest the kernel could gate), per-64-row gate
        # group (the production gate width), and per query (the
        # information floor of sub-box pruning).
        cand_tile, cand_gate, cand_query, subs_tile = [], [], [], []
        for t in range(nqt):
            qs = q[t * TILE:(t + 1) * TILE]
            oks = qok[t * TILE:(t + 1) * TILE]
            blocks = np.unique(
                order[t * TILE:(t + 1) * TILE][
                    member_q[t * TILE:(t + 1) * TILE]])
            if len(blocks) == 0 or not oks.any():
                continue
            smin = sub_min[blocks].reshape(-1, 6)
            smax = sub_max[blocks].reshape(-1, 6)
            cnts = sub_cnt[blocks].reshape(-1)
            lbs = box_lb(qs, smin, smax)
            lbs[~oks] = np.inf
            pass_q = lbs <= MAXD * (1 + 1e-6)
            hit = pass_q.any(0)
            cand_tile.append(cnts[hit].sum())
            subs_tile.append(hit.sum())
            for g in range(0, TILE, 64):
                hg = pass_q[g:g + 64].any(0)
                cand_gate.append(cnts[hg].sum())
            cand_query.append(
                (pass_q * cnts[None, :]).sum(1)[oks].mean())
        log(f"S={S}: member subs/tile mean {np.mean(subs_tile):.1f} "
            f"of {cur_blocks_per_tile.mean() * S:.0f}; candidate points "
            f"tile-union {np.mean(cand_tile):.0f} / per-gate64 "
            f"{np.mean(cand_gate):.0f} / per-query {np.mean(cand_query):.0f} "
            f"(current tile-union {cur_blocks_per_tile.mean() * cap:.0f})")

    log("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
