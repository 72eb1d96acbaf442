"""Nearest-neighbor correspondence search — tiled brute force on the MXU.

TPU-native replacement for the FLANN kd-tree matcher
(NearestNeighbor.h:104-314, both the 3-dim geometric and the 6-dim color-ICP
variants). kd-trees are pointer-chasing machines and map terribly onto a
systolic array; at scan-registration sizes a tiled brute-force search that
expands ``|q - t|^2 = |q|^2 + |t|^2 - 2 q.t`` and rides the MXU for the
``q @ t^T`` term is both exact (no FLANN "16 checks" approximation) and
faster per chip.

Two interchangeable implementations:

* :func:`nn_search_xla` — pure jax.numpy, chunked ``lax.map``; runs anywhere
  (the CPU test mesh) and is the correctness oracle.
* :func:`nn_search_pallas` — the Pallas kernel: grid over (query tiles x
  target tiles), running (min, argmin) accumulated in VMEM across the target
  axis.

Both return, per query row, the index of the closest target and the squared
distance. Thresholding (``dist2 <= max_distance``, matching the squared
comparison at NearestNeighbor.h:182) is left to the caller so the same
search result can be re-thresholded per pyramid level.

Invalid / padded target rows are expected to carry ``cloud.PAD_SENTINEL``
coordinates, which keeps every lane finite (no NaN poisoning) while making
such rows unelectable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sizes: queries per grid row, targets per inner step. The distance tile
# (TQ x TT f32) plus operands must fit VMEM comfortably: 256*1024*4 = 1 MiB.
TILE_Q = 256
TILE_T = 1024
# Feature dim padded to the f32 sublane multiple.
FEATURE_PAD = 8


def _pad_features(x: jax.Array) -> jax.Array:
    """Zero-pad the trailing feature dim to FEATURE_PAD columns."""
    d = x.shape[-1]
    if d == FEATURE_PAD:
        return x
    return jnp.pad(x, ((0, 0), (0, FEATURE_PAD - d)))


def _pad_rows(x: jax.Array, multiple: int, fill: float) -> jax.Array:
    n = x.shape[0]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return x
    return jnp.pad(x, ((0, target - n), (0, 0)), constant_values=fill)


def color_features(points: jax.Array, colors: jax.Array) -> jax.Array:
    """6-dim [x, y, z, r/255, g/255, b/255] feature rows of the color-ICP
    matcher (NearestNeighbor.h:212-224: color_scale=1, normalize=1/255)."""
    return jnp.concatenate([points, colors[:, :3] * (1.0 / 255.0)], axis=1)


# ---------------------------------------------------------------------------
# XLA (portable) path
# ---------------------------------------------------------------------------


def nn_search_xla(
    queries: jax.Array, targets: jax.Array, *, chunk: int = 4096
) -> tuple[jax.Array, jax.Array]:
    """Exact 1-NN via chunked dense distance tiles (runs on any backend)."""
    n = queries.shape[0]
    qp = _pad_rows(queries, chunk, 0.0)
    t_norm2 = jnp.sum(targets * targets, axis=1)

    def one_chunk(q):
        g = jnp.dot(q, targets.T, precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.sum(q * q, axis=1, keepdims=True) + t_norm2[None, :] - 2.0 * g
        return jnp.argmin(d2, axis=1).astype(jnp.int32), jnp.min(d2, axis=1)

    num_chunks = qp.shape[0] // chunk
    idx, d2 = jax.lax.map(one_chunk, qp.reshape(num_chunks, chunk, -1))
    return idx.reshape(-1)[:n], d2.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _nn_kernel(q_ref, t_ref, qn2_ref, tn2_ref, dist_ref, idx_ref):
    """One (query-tile, target-tile) cell: distances + running argmin.

    Grid = (num_q_tiles, num_t_tiles) with the target axis innermost; the
    output block for query tile i is revisited for every j, carrying the
    running minimum in VMEM (canonical reduction-over-grid pattern).
    """
    j = pl.program_id(1)

    # HIGHEST precision: TPU matmuls default to bf16 passes, which loses the
    # mantissa bits that decide near-tie nearest neighbors. With exact-f32
    # passes the kernel is bit-faithful for 1-NN at scan-registration scales.
    g = jax.lax.dot_general(
        q_ref[:],
        t_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [TILE_Q, TILE_T]
    d2 = qn2_ref[:] + tn2_ref[:] - 2.0 * g

    local_min = jnp.min(d2, axis=1, keepdims=True)
    local_arg = jnp.argmin(d2, axis=1).astype(jnp.int32).reshape(-1, 1) + j * TILE_T

    @pl.when(j == 0)
    def _():
        dist_ref[:] = local_min
        idx_ref[:] = local_arg

    @pl.when(j > 0)
    def _():
        better = local_min < dist_ref[:]
        idx_ref[:] = jnp.where(better, local_arg, idx_ref[:])
        dist_ref[:] = jnp.where(better, local_min, dist_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_search_pallas(
    queries: jax.Array, targets: jax.Array, *, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Exact 1-NN as a Pallas TPU kernel.

    ``queries`` (Nq, D) and ``targets`` (Nt, D) with D <= 8; rows are padded
    internally to tile multiples. Padded query rows produce garbage results
    that callers mask; padded target rows are filled with a large sentinel so
    they never win.
    """
    nq = queries.shape[0]
    q = _pad_rows(_pad_features(queries), TILE_Q, 0.0)
    # Sentinel 1e6 -> dist2 ~ 1e13, dwarfs any real match but stays finite.
    t = _pad_rows(_pad_features(targets), TILE_T, 1.0e6)

    qn2 = jnp.sum(q * q, axis=1, keepdims=True)               # (Nq, 1)
    tn2 = jnp.sum(t * t, axis=1).reshape(1, -1)               # (1, Nt)

    grid = (q.shape[0] // TILE_Q, t.shape[0] // TILE_T)

    dist, idx = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_Q, FEATURE_PAD), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_T, FEATURE_PAD), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_T), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_Q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((q.shape[0], 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q.shape[0] * t.shape[0] * FEATURE_PAD + 4 * q.shape[0] * t.shape[0],
            bytes_accessed=(q.size + t.size) * 4 + q.shape[0] * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, t, qn2, tn2)

    return idx[:nq, 0], dist[:nq, 0]


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn_k(
    queries: jax.Array, targets: jax.Array, k: int, *, chunk: int = 1024
) -> tuple[jax.Array, jax.Array]:
    """Exact k-NN (small k) via chunked distance tiles + top_k.

    Used by the PCL-style normal estimation (k=5, PointCloud.h:53) — runs
    once per cloud at load time, so the dense chunked form is fine on every
    backend. Returns ``(indices (N,k), dist2 (N,k))`` sorted ascending.
    """
    n = queries.shape[0]
    qp = _pad_rows(queries, chunk, 0.0)
    t_norm2 = jnp.sum(targets * targets, axis=1)

    def one_chunk(q):
        g = jnp.dot(q, targets.T, precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.sum(q * q, axis=1, keepdims=True) + t_norm2[None, :] - 2.0 * g
        neg, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), -neg

    num_chunks = qp.shape[0] // chunk
    idx, d2 = jax.lax.map(one_chunk, qp.reshape(num_chunks, chunk, -1))
    return idx.reshape(-1, k)[:n], d2.reshape(-1, k)[:n]


def nn_search(
    queries: jax.Array, targets: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Backend-dispatching 1-NN: Pallas on TPU, XLA elsewhere."""
    if jax.default_backend() in ("tpu", "axon"):
        return nn_search_pallas(queries, targets)
    return nn_search_xla(queries, targets)


def match(
    queries: jax.Array,
    targets: jax.Array,
    max_distance: float | jax.Array,
    query_mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Full matching stage: 1-NN + squared-distance threshold.

    Returns ``(indices, dist2, valid)``. The threshold compares SQUARED
    distance against ``max_distance`` exactly like the FLANN path
    (NearestNeighbor.h:182 — the reference stores the already-squared bound,
    ICPOptimizer.h:154).
    """
    idx, d2 = nn_search(queries, targets)
    valid = d2 <= max_distance
    if query_mask is not None:
        valid = valid & query_mask
    return idx, d2, valid
