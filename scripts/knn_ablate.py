"""Ablation microbenchmarks for the visited-list kernel: which part costs?

Variants (same DMA pattern, same visit lists):
  full     - production kernel (argmax + prune + prefetch)
  maxonly  - compute = max only (no argmax)        -> argmax share
  dmaonly  - no compute at all                     -> DMA + loop overhead
  noprune  - unconditional chunks, double-buffered -> prune benefit/cost
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "evidence", "knn_ablate_log.txt")


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line)
    with open(LOG, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


def make_kernel(tile_t, max_v, chunk, mode):
    def kernel(count_ref, bound_ref, vlist_ref, suflb_ref, t_ref, q_ref,
               qn2_ref, dist_ref, idx_ref, vrow_ref, lbrow_ref, flag_ref,
               tbuf_ref, copy_sems, row_sem, lb_sem):
        i = pl.program_id(0)
        n_chunks = count_ref[i]
        bound = bound_ref[0]
        row_dma = pltpu.make_async_copy(vlist_ref.at[i], vrow_ref, row_sem)
        row_dma.start()
        lb_dma = pltpu.make_async_copy(suflb_ref.at[i], lbrow_ref, lb_sem)
        lb_dma.start()
        dist_ref[:] = jnp.full_like(dist_ref, bound)
        idx_ref[:] = jnp.full_like(idx_ref, -1)
        row_dma.wait()
        lb_dma.wait()

        def tile_dma(slot, k, j):
            tile_id = vrow_ref[0, k * chunk + j]
            return pltpu.make_async_copy(
                t_ref.at[tile_id],
                tbuf_ref.at[slot, :, pl.ds(j * tile_t, tile_t)],
                copy_sems.at[slot, j],
            )

        def start_chunk(slot, k):
            for j in range(chunk):
                tile_dma(slot, k, j).start()

        def wait_chunk(slot, k):
            for j in range(chunk):
                tile_dma(slot, k, j).wait()

        prec = {'high': jax.lax.Precision.HIGH,
                'default': jax.lax.Precision.DEFAULT}.get(
            mode, jax.lax.Precision.HIGHEST)
        def compute(slot, k):
            t = tbuf_ref[slot]
            if mode == "direct":
                # VPU outer-difference distances: no MXU, no cancellation.
                d2 = ((q_ref[:, 0:1] - t[0:1, :]) ** 2
                      + (q_ref[:, 1:2] - t[1:2, :]) ** 2
                      + (q_ref[:, 2:3] - t[2:3, :]) ** 2)
                local_min = jnp.min(d2, axis=1, keepdims=True)
                gpos = jnp.argmin(d2, axis=1).astype(jnp.int32)
                sub = jax.lax.rem(gpos, tile_t)
                seg = gpos // tile_t
                base = jnp.full_like(gpos, vrow_ref[0, k * chunk])
                for j in range(1, chunk):
                    base = jnp.where(seg == j, vrow_ref[0, k * chunk + j], base)
                local_arg = (base * tile_t + sub).reshape(-1, 1)
                better = local_min < dist_ref[:]
                idx_ref[:] = jnp.where(better, local_arg, idx_ref[:])
                dist_ref[:] = jnp.where(better, local_min, dist_ref[:])
                return
            g = jax.lax.dot_general(
                q_ref[:], t, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            if mode == "maxonly":
                local_best = jnp.max(g, axis=1, keepdims=True)
                local_min = qn2_ref[:] - 2.0 * local_best
                better = local_min < dist_ref[:]
                dist_ref[:] = jnp.where(better, local_min, dist_ref[:])
                return
            local_best = jnp.max(g, axis=1, keepdims=True)
            gpos = jnp.argmax(g, axis=1).astype(jnp.int32)
            local_min = qn2_ref[:] - 2.0 * local_best
            sub = jax.lax.rem(gpos, tile_t)
            seg = gpos // tile_t
            base = jnp.full_like(gpos, vrow_ref[0, k * chunk])
            for j in range(1, chunk):
                base = jnp.where(seg == j, vrow_ref[0, k * chunk + j], base)
            local_arg = (base * tile_t + sub).reshape(-1, 1)
            better = local_min < dist_ref[:]
            idx_ref[:] = jnp.where(better, local_arg, idx_ref[:])
            dist_ref[:] = jnp.where(better, local_min, dist_ref[:])

        if mode == "noprune":
            @pl.when(n_chunks > 0)
            def _():
                start_chunk(0, 0)

                def body(k, _):
                    slot = jax.lax.rem(k, 2)
                    nslot = jax.lax.rem(k + 1, 2)

                    @pl.when(k + 1 < n_chunks)
                    def _():
                        start_chunk(nslot, k + 1)
                    wait_chunk(slot, k)
                    compute(slot, k)
                    return 0
                jax.lax.fori_loop(0, n_chunks, body, 0)
            return

        if mode == "dmaonly":
            @pl.when(n_chunks > 0)
            def _():
                start_chunk(0, 0)

                def body(k, _):
                    slot = jax.lax.rem(k, 2)
                    nslot = jax.lax.rem(k + 1, 2)

                    @pl.when(k + 1 < n_chunks)
                    def _():
                        start_chunk(nslot, k + 1)
                    wait_chunk(slot, k)
                    # touch the buffer minimally so DMA isn't elided
                    dist_ref[:] = dist_ref[:] + tbuf_ref[slot][0:1, 0:1] * 1e-30
                    return 0
                jax.lax.fori_loop(0, n_chunks, body, 0)
            return

        # full / maxonly: production prune + prefetch machinery
        @pl.when(n_chunks > 0)
        def _():
            flag_ref[0] = 1
            flag_ref[1] = 0
            start_chunk(0, 0)

            def body(k, _):
                slot = jax.lax.rem(k, 2)
                nslot = jax.lax.rem(k + 1, 2)
                wb_pre = jnp.max(dist_ref[:])

                @pl.when((k + 1 < n_chunks)
                         & (lbrow_ref[0, (k + 1) * chunk] <= wb_pre))
                def _():
                    flag_ref[nslot] = 1
                    start_chunk(nslot, k + 1)

                @pl.when(flag_ref[slot] == 1)
                def _():
                    wait_chunk(slot, k)
                    compute(slot, k)
                flag_ref[slot] = 0
                return 0
            jax.lax.fori_loop(0, n_chunks, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_t", "chunk", "mode"))
def search(q_aug, qn2, vlist, lblist, counts, points_t3, bound_val,
           *, tile_t, chunk, mode):
    nq_tiles = q_aug.shape[0] // 256
    max_v = vlist.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nq_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((256, 8), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((256, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((8, max_v), jnp.int32),
            pltpu.SMEM((8, max_v), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((2, 8, chunk * tile_t), jnp.float32),
            pltpu.SemaphoreType.DMA((2, chunk)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    dist, idx = pl.pallas_call(
        make_kernel(tile_t, max_v, chunk, mode),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q_aug.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((q_aug.shape[0], 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(counts, bound_val, vlist, lblist, points_t3, q_aug, qn2)
    return dist, idx


def main():
    import bench
    from icp_variants_tpu.ops import knn

    src, _ = bench.synth_cloud(bench.N_POINTS, 0)
    tgt, _ = bench.synth_cloud(bench.N_POINTS, 0)
    ang = 0.05
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    )
    src = src @ R.T + np.array([0.5, -0.3, 0.1], np.float32)
    src = src[np.argsort(knn.morton_codes_np(src))]
    tgt = tgt[np.argsort(knn.morton_codes_np(tgt))]
    cap, k_cap, n_draw = len(src), 4736, 3651
    rng = np.random.default_rng(0)
    slots = np.arange(k_cap)
    starts = (slots * cap) // n_draw
    ends = ((slots + 1) * cap) // n_draw
    u = rng.random(k_cap)
    idx = np.minimum(starts + (u * np.maximum(ends - starts, 1)).astype(int), cap - 1)
    q = src[idx]
    q[n_draw:] = q[0]
    qj = jnp.asarray(q)

    tile_t, chunk = 512, 8
    index = knn.build_target_index(jnp.asarray(tgt), tile_t=tile_t)
    bound_val = jnp.float32(10.0) * (1 + 1e-6) + 1e-30

    # Precompute visit lists ONCE (hoisted: measures pure kernel time).
    qp = knn._pad_rows(knn._pad_features(qj), 256, 0.0)
    qn2 = jnp.sum(qp * qp, axis=1, keepdims=True)
    qtiles = qp.reshape(-1, 256, knn.FEATURE_PAD)
    vlist, suffix, counts, _c0 = knn._visit_lists(
        jnp.min(qtiles, axis=1), jnp.max(qtiles, axis=1),
        index.bbox_min, index.bbox_max, bound_val,
    )
    n_tiles = index.points.shape[0] // tile_t
    max_v = ((n_tiles + 127) // 128) * 128
    vlist = jnp.pad(vlist, ((0, 0), (0, max_v - n_tiles)))
    suffix = jnp.pad(suffix, ((0, 0), (0, max_v - n_tiles)),
                     constant_values=knn._LB_PAD)
    vlist = jnp.broadcast_to(vlist[:, None, :], (vlist.shape[0], 8, max_v))
    suffix = jnp.broadcast_to(suffix[:, None, :], (suffix.shape[0], 8, max_v))
    ch_counts = (counts + chunk - 1) // chunk
    q_aug = qp.at[:, 7].set(-1.0)
    bv = jnp.asarray([bound_val], jnp.float32)

    log(f"counts per qtile: {np.asarray(jax.device_get(ch_counts)).tolist()}")

    N_IT = 20

    def timed(name, mode):
        @jax.jit
        def run(q_aug, qn2):
            def body(c, i):
                d, ix = search(q_aug + c, qn2, vlist, suffix, ch_counts,
                               index.points_t3, bv,
                               tile_t=tile_t, chunk=chunk, mode=mode)
                return c + 0.0 * d[0, 0] * 1e-30, d[0, 0]
            return jax.lax.scan(body, jnp.float32(0), jnp.arange(N_IT))[1]
        out = run(q_aug, qn2)
        jax.device_get(out)
        t0 = time.perf_counter()
        for _ in range(3):
            jax.device_get(run(q_aug, qn2))
        dt = (time.perf_counter() - t0) / 3 / N_IT
        log(f"{name:10s} {dt*1e3:8.3f} ms/iter (kernel only, lists hoisted)")

    for mode in ("full", "maxonly", "dmaonly", "noprune", "default", "direct"):
        timed(mode, mode)
    log("done")


if __name__ == "__main__":
    main()
