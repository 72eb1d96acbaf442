"""Selection stage (stage 1): masked point selection.

The reference (selection.h:8-107) either passes all points through
(``SELECT_ALL``) or Bernoulli(p)-samples with a mt19937, re-sampling every
ICP iteration (ICPOptimizer.h:247-248). TPU-natively, selection is a boolean
mask drawn with ``jax.random`` under a threaded PRNG key — no compaction, no
dynamic shapes; downstream stages are mask-aware.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def select_all(base_mask: jax.Array) -> jax.Array:
    """SELECT_ALL: the base validity mask unchanged (selection.h:30-34)."""
    return base_mask


def random_sampling(
    key: jax.Array, base_mask: jax.Array, proba: float | jax.Array
) -> jax.Array:
    """RANDOM_SAMPLING: keep each valid point independently with probability
    ``proba`` (selection.h:88-106)."""
    u = jax.random.uniform(key, base_mask.shape)
    return base_mask & (u < proba)


def bernoulli_gap_indices(
    key: jax.Array,
    proba: float,
    stride: jax.Array,
    capacity: int,
    k_cap: int,
    index_offset: jax.Array | int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Positions of a Bernoulli(``proba``) process over the stride lattice,
    drawn directly as geometric inter-arrival gaps.

    A Bernoulli process' success positions have iid Geometric(p) gaps, so
    slot i of the output holds the row index of the i-th success — the
    *exact* distribution of the reference's per-point mt19937 Bernoulli +
    compaction (selection.h:88-106, ICPOptimizer.h:247-248) at O(k) cost
    instead of an O(N) full-cloud draw + cumsum-compaction per iteration.
    Rows come out ascending by construction, preserving the Morton coherence
    the pruned k-NN kernel's query bboxes rely on. Successes past the
    ``k_cap``-th are dropped — the same >10-sigma overflow tail as
    ``_compact_capacity``'s fixed buffer.

    ``stride`` restricts the process to the multi-resolution lattice
    (rows ≡ 0 mod stride *globally*); ``index_offset`` is the shard's global
    row offset under point-axis sharding.
    """
    u = jax.random.uniform(key, (k_cap,), minval=jnp.finfo(jnp.float32).tiny)
    # failures before each success ~ Geometric0(p)
    g = jnp.floor(jnp.log(u) / jnp.log1p(-proba)).astype(jnp.int32)
    lattice = jnp.cumsum(g + 1) - 1
    # Clamp on the lattice BEFORE scaling by stride so rows stay in int32
    # even at coarse strides (clamped slots land past capacity => masked).
    lattice_cap = (capacity + stride - 1) // stride
    lattice = jnp.minimum(lattice, lattice_cap)
    start = (-jnp.asarray(index_offset, jnp.int32)) % stride
    rows = lattice * stride + start
    in_range = rows < capacity
    return jnp.minimum(rows, capacity - 1), in_range


def random_indices(
    key: jax.Array, n: int, count: int, capacity: int
) -> tuple[jax.Array, jax.Array]:
    """RANDOM_FAST: jittered STRATIFIED draw — slot k samples uniformly
    inside stratum [k*n/count, (k+1)*n/count). Fixed count, ascending by
    construction (preserves the Morton coherence the pruned k-NN kernel
    needs — an unsorted uniform draw would collapse the bbox pruning), and
    uniform spatial coverage, which is if anything a better subsample for
    ICP than iid Bernoulli."""
    import numpy as np

    # Stratum boundaries are static (n/count/capacity are Python ints):
    # compute them on the host in int64 — device int32 `slots * n`
    # overflows at ETH scale once count exceeds ~2^31/n (~5.9k draws for
    # 365k-point clouds), corrupting the draw.
    slots64 = np.arange(capacity, dtype=np.int64)
    starts_np = (slots64 * n) // count
    ends_np = ((slots64 + 1) * n) // count
    starts = jnp.asarray(starts_np.astype(np.int32))
    width = jnp.asarray(
        np.maximum(ends_np - starts_np, 1).astype(np.int32)
    )
    u = jax.random.uniform(key, (capacity,))
    idx = jnp.minimum(starts + (u * width).astype(jnp.int32), n - 1)
    mask = jnp.arange(capacity) < count
    return idx, mask
