"""Probe: projective window scan — fancy-index row gathers vs one
lax.gather of contiguous (span,3) slices per query per window row.

Appends to scripts/evidence/proj_gather_log.txt.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "evidence", "proj_gather_log.txt"
)


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line)
    with open(LOG, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from icp_variants_tpu.ops import projective  # noqa: E402

H, W = 480, 640
WINDOW = 12
SPAN = 2 * WINDOW + 1


def make_clouds():
    rng = np.random.default_rng(0)
    fx, fy, cx, cy = 525.0, 525.0, 319.5, 239.5
    vv, uu = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    z = 2.0 + 0.12 * np.sin(uu / 40.0) * np.cos(vv / 40.0)
    x = (uu - cx) / fx * z
    y = (vv - cy) / fy * z
    tgt = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    valid = rng.random(H * W) > 0.05
    q = tgt + rng.normal(0, 0.003, tgt.shape).astype(np.float32)
    return q.astype(np.float32), tgt, valid


def projective_match_sliced(
    query_points, target_points, target_valid, *, fx, fy, cx, cy,
    width, height, window=12, max_distance=0.1, query_mask=None,
):
    """Window scan with ONE contiguous-slice gather per window row:
    lax.gather(slice_sizes=(2W+1, 3)) pulls each query's whole window row
    (contiguous memory) in a single 300-byte slice."""
    n = query_points.shape[0]
    x, y, z = query_points[:, 0], query_points[:, 1], query_points[:, 2]
    safe_z = jnp.where(z == 0, 1.0, z)
    u0 = jnp.round(x * fx / safe_z + cx).astype(jnp.int32)
    v0 = jnp.round(y * fy / safe_z + cy).astype(jnp.int32)

    big = jnp.asarray(3.0e13, jnp.float32)
    span = 2 * window + 1
    dus = jnp.arange(-window, window + 1)
    tp_flat = target_points
    tv = target_valid

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    def body(k, carry):
        best_d2, best_idx = carry
        dv = k - window
        v = v0 + dv
        u = u0[:, None] + dus[None, :]
        in_image = (u >= 0) & (u < width) & ((v >= 0) & (v < height))[:, None]
        start = jnp.clip(v * width + (u0 - window), 0, width * height - span)
        starts = jnp.stack(
            [start, jnp.zeros_like(start)], axis=-1
        )  # (N, 2)
        tp = jax.lax.gather(
            tp_flat, starts, dnums, slice_sizes=(span, 3),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (N, span, 3)
        lin = start[:, None] + jnp.arange(span)[None, :]
        ok = in_image & tv[lin]
        d2 = jnp.sum((query_points[:, None, :] - tp) ** 2, axis=2)
        d2 = jnp.where(ok, d2, big)
        row_best = jnp.min(d2, axis=1)
        row_arg = jnp.take_along_axis(
            lin, jnp.argmin(d2, axis=1)[:, None], axis=1
        )[:, 0]
        better = row_best < best_d2
        return (
            jnp.where(better, row_best, best_d2),
            jnp.where(better, row_arg, best_idx),
        )

    init = (jnp.full((n,), big, jnp.float32), jnp.full((n,), -1, jnp.int32))
    best_d2, best_idx = jax.lax.fori_loop(0, span, body, init)
    valid = best_d2 <= max_distance
    if query_mask is not None:
        valid = valid & query_mask
    return best_idx, best_d2, valid


def main():
    q, tgt, valid = make_clouds()
    qj, tj, vj = jnp.asarray(q), jnp.asarray(tgt), jnp.asarray(valid)
    kw = dict(fx=525.0, fy=525.0, cx=319.5, cy=239.5, width=W, height=H)

    f_old = jax.jit(lambda a, b, c: projective.projective_match(a, b, c, **kw))
    f_new = jax.jit(lambda a, b, c: projective_match_sliced(a, b, c, **kw))

    log("=== projective gather probe (307k queries, 640x480, W=12) ===")
    for name, f in (("fancy-index rows", f_old), ("contiguous slices", f_new)):
        t0 = time.perf_counter()
        out = f(qj, tj, vj)
        jax.device_get(out[0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            out = f(qj, tj, vj)
            jax.device_get(out[0])
        dt = (time.perf_counter() - t0) / 3
        log(f"{name:20s}: {dt*1e3:8.1f} ms/call (compile {compile_s:.0f} s)")
        globals()[f"out_{name.split()[0].replace('-','_')}"] = jax.device_get(
            jnp.stack([out[0], out[1].astype(jnp.int32)])
        )

    i1, _ = out_fancy  # noqa: F821
    i2, _ = out_contiguous  # noqa: F821
    log(f"index agreement: {(i1 == i2).mean():.6f}")
    log("done")


if __name__ == "__main__":
    main()
