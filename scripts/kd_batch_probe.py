"""Why does the kd (v3) matcher regress under the 16-pair vmap?

Hypothesis: vmapped block gathers (gather with batch_dims=1) lower worse
than a flat row gather with per-pair index offsets. Measure both, plus the
full nn_search_kd under vmap vs a manually-flattened variant.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "evidence", "kd_batch_probe_log.txt")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from icp_variants_tpu.core import cloud as cloud_lib
    from icp_variants_tpu.ops import kdtree

    B = 16
    NQ = 4736
    pairs = bench.make_pairs()
    log("building clouds + kd indexes...")
    tclouds = [
        cloud_lib.from_numpy(tp, normals=tn, morton_order=True)
        for (_, _, tp, tn) in pairs
    ]
    kds = [
        kdtree.build_kd_index(np.asarray(t.points), np.asarray(t.valid))
        for t in tclouds
    ]
    kd = kdtree.stack_kd_indexes(kds)
    nc, dcap = kds[0].block_pts.shape
    log(f"kd: {B} pairs, blocks {nc} x {dcap}")

    rng = np.random.default_rng(0)
    q = jnp.asarray(
        rng.uniform(-20, 20, (B, NQ, 3)).astype(np.float32)
    )

    def timeit(name, fn, *args, iters=20):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / 3 / iters * 1000
        log(f"{name:44s} {dt:8.3f} ms/iter (compile {tc:.0f} s)")
        return dt

    K = kdtree.K_DEFAULT

    # --- full search, scan of 20 iters to amortize dispatch ---------------
    def scan_of(fn):
        def run(qb):
            def body(c, _):
                r = fn(qb + c * 1e-6)
                return c + 1.0, jax.tree.map(lambda x: x[..., :1], r)
            _, outs = jax.lax.scan(body, 0.0, None, length=20)
            return outs
        return jax.jit(run)

    # A) vmapped nn_search_kd (what the pipeline does today)
    vm = jax.vmap(lambda qq, kk: kdtree.nn_search_kd(qq, kk, 10.0), (0, 0))
    timeit("A: vmap(nn_search_kd)", scan_of(lambda qb: vm(qb, kd)), q)

    # B) flattened variant: one global gather with per-pair offsets
    flat_pts = kd.block_pts.reshape(B * nc, dcap)
    flat_orig = kd.block_orig.reshape(B * nc, -1)

    def flat_search(qb):
        d = 3
        cap = dcap // d
        lb = jax.vmap(
            lambda qq, lo, hi: kdtree._box_lb(qq, lo, hi), (0, 0, 0)
        )(qb, kd.block_min, kd.block_max)            # (B, NQ, nc)
        sel, resid = jax.vmap(lambda w: kdtree._extract_min(w, K))(lb)
        goff = (jnp.arange(B, dtype=jnp.int32) * nc)[:, None, None]
        gsel = (sel + goff).reshape(B * NQ, K)
        cand = flat_pts[gsel]                        # flat row gather
        qf = qb.reshape(B * NQ, 3)
        d2 = None
        for j in range(d):
            diff = cand[:, :, j * cap:(j + 1) * cap] - qf[:, j, None, None]
            d2 = diff * diff if d2 is None else d2 + diff * diff
        per_blk = jnp.min(d2, axis=2)
        blk_pos = jnp.argmin(per_blk, axis=1)
        d2s = jnp.min(per_blk, axis=1)
        best_blk = jnp.take_along_axis(gsel, blk_pos[:, None], axis=1)[:, 0]
        slot = jnp.argmin(
            jnp.take_along_axis(d2, blk_pos[:, None, None], axis=1)[:, 0, :],
            axis=1,
        )
        orig = flat_orig[best_blk, slot]
        return orig.reshape(B, NQ), d2s.reshape(B, NQ), resid
    timeit("B: flat-gather search", scan_of(flat_search), q)

    # C) isolate: the gather alone, vmapped vs flat
    sel_fixed = jnp.asarray(
        rng.integers(0, nc, (B, NQ, K)).astype(np.int32))

    def g_vmap(qb):
        s = (sel_fixed + qb[:, :1, :1].astype(jnp.int32) * 0)
        return jax.vmap(lambda bp, ss: bp[ss], (0, 0))(kd.block_pts, s)

    def g_flat(qb):
        s = (sel_fixed + qb[:, :1, :1].astype(jnp.int32) * 0)
        goff = (jnp.arange(B, dtype=jnp.int32) * nc)[:, None, None]
        return flat_pts[(s + goff).reshape(B * NQ, K)]
    timeit("C1: gather vmapped (batch_dims=1)", scan_of(g_vmap), q)
    timeit("C2: gather flat rows", scan_of(g_flat), q)

    # D) lb + extraction alone under vmap
    def lbx(qb):
        lb = jax.vmap(
            lambda qq, lo, hi: kdtree._box_lb(qq, lo, hi), (0, 0, 0)
        )(qb, kd.block_min, kd.block_max)
        sel, resid = jax.vmap(lambda w: kdtree._extract_min(w, K))(lb)
        return sel, resid
    timeit("D: lb + extract (vmap)", scan_of(lbx), q)

    log("done")


if __name__ == "__main__":
    main()
