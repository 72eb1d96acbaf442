"""6-dim Morton source ordering probe for the color config (round 5).

The fine-level matcher's cost is gate-granular: every 32-query gate
scans the UNION of its members' kd blocks, and in the 6-dim color tree
raster-adjacent pixels fragment across ~3 distinct blocks per gate
(sharp color edges), so each query pays ~3 blocks of candidates. A
host-side Morton order over the SAME 6-dim feature space the tree
splits on ([x,y,z, rgb/255], shared scale across dims) clusters
same-block queries into gates.

Load-time host reordering is the established pattern (morton_codes_np;
device sorts are forbidden here). The stride lattice then subsamples
the 6-dim Morton order instead of image order — the same documented
deviation class as the existing xyz-Morton stride (PARITY.md), so the
accuracy gate runs alongside per the honesty rule.

Appends to scripts/evidence/block_target_probe.txt.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "evidence", "block_target_probe.txt")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


def morton6_order(points, colors, valid):
    """Host permutation: 6-dim Morton over [xyz, rgb/255] with a SHARED
    quantization scale (the tree's metric is unweighted Euclidean in
    these units); invalid rows stable-sorted to the end."""
    feats = np.concatenate(
        [np.asarray(points, np.float64),
         np.asarray(colors, np.float64)[:, :3] / 255.0], axis=1)
    v = np.asarray(valid, bool)
    if v.any():
        lo = feats[v].min(axis=0)
        rng = feats[v].max(axis=0) - lo
        scale = 1023.0 / max(float(rng.max()), 1e-12)
        q = np.clip((feats - lo) * scale, 0.0, 1023.0).astype(np.uint64)
    else:
        q = np.zeros_like(feats, np.uint64)

    def spread6(x):
        out = np.zeros_like(x, np.uint64)
        for b in range(10):
            out |= ((x >> np.uint64(b)) & np.uint64(1)) << np.uint64(6 * b)
        return out

    code = np.zeros(feats.shape[0], np.uint64)
    for d in range(6):
        code |= spread6(q[:, d]) << np.uint64(d)
    code[~v] = np.uint64(0xFFFFFFFFFFFFFFFF)  # invalid rows last
    return np.argsort(code, kind="stable")


def main():
    import jax

    import bench
    from icp_variants_tpu.core.cloud import Cloud
    from icp_variants_tpu.pipeline import icp

    log("=== 6-dim Morton source-order probe (color checks16) ===")
    tum_state = bench.prepare_tum_state()
    src = tum_state["sources_full"]
    pts = np.asarray(src.points)
    nrm = np.asarray(src.normals)
    col = np.asarray(src.colors)
    val = np.asarray(src.valid)
    perm_clouds = []
    for b in range(pts.shape[0]):
        order = morton6_order(pts[b], col[b], val[b])
        perm_clouds.append(Cloud(
            points=pts[b][order], normals=nrm[b][order],
            colors=col[b][order], valid=val[b][order]))
    tum_state["sources_full"] = icp.stack_clouds(perm_clouds)
    log(f"permuted {pts.shape[0]} frames on host")

    for attempt in range(4):
        try:
            t, r = bench.measure_color_accuracy(tum_state, matching_checks=16)
            dt = bench.bench_color_multires(tum_state, matching_checks=16)
            log(f"color checks16 morton6-source: {1.0/dt:.3f} f/s  "
                f"t_err={t*1000:.3f} mm r={r:.5f}  "
                f"(raster control this session: 2.038 f/s t=0.863; "
                f"bar 2.093)")
            break
        except Exception as e:  # noqa: BLE001
            log(f"attempt {attempt} failed ({type(e).__name__}: "
                f"{str(e)[:120]}); retrying")
            time.sleep(10)
    log("morton6 probe done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
