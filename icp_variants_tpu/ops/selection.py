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


def random_indices(
    key: jax.Array, n: int, count: int, capacity: int
) -> tuple[jax.Array, jax.Array]:
    """RANDOM_FAST: jittered STRATIFIED draw — slot k samples uniformly
    inside stratum [k*n/count, (k+1)*n/count). Fixed count, ascending by
    construction (preserves the Morton coherence the pruned k-NN kernel
    needs — an unsorted uniform draw would collapse the bbox pruning), and
    uniform spatial coverage, which is if anything a better subsample for
    ICP than iid Bernoulli."""
    slots = jnp.arange(capacity)
    starts = (slots * n) // count
    ends = ((slots + 1) * n) // count
    width = jnp.maximum(ends - starts, 1)
    u = jax.random.uniform(key, (capacity,))
    idx = jnp.minimum(starts + (u * width).astype(jnp.int32), n - 1)
    mask = slots < count
    return idx, mask
