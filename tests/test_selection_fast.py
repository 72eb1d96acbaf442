"""RANDOM_FAST selection mode: fixed-count uniform draw (extension)."""

import jax
import numpy as np

from icp_variants_tpu.pipeline.config import Metric, Minimizer, Selection
from icp_variants_tpu.workloads import bunny


def test_random_fast_converges():
    cfg = bunny.default_config(
        minimizer=Minimizer.LINEAR,
        metric=Metric.POINT_TO_PLANE,
        selection=Selection.RANDOM_FAST,
        selection_proba=0.5,
    )
    res = bunny.align_bunny(cfg)
    assert res.final_rmse < 1.5e-3
    # Roughly half the valid points selected each iteration (with-replacement
    # duplicates make it slightly fewer matches than p*N).
    assert 300 < res.num_matches[-1] <= 560


def test_random_fast_distinct_per_iteration():
    cfg = bunny.default_config(
        minimizer=Minimizer.LINEAR,
        selection=Selection.RANDOM_FAST,
        selection_proba=0.3,
        n_iterations=4,
    )
    res = bunny.align_bunny(cfg)
    # Different draws per iteration -> match counts vary.
    assert len(set(res.num_matches.tolist())) > 1


def test_random_indices_stratified_no_overflow():
    """random_indices at ETH scale with a large draw count: device int32
    `slots * n` used to overflow past slot ~2^31/n (~5.9k at 365k points),
    producing negative/duplicated indices and destroying the ascending
    Morton order the pruned kernel needs."""
    from icp_variants_tpu.ops.selection import random_indices

    n, count = 365_056, 45_696
    idx, mask = random_indices(jax.random.PRNGKey(0), n, count, count)
    idx = np.asarray(idx)[np.asarray(mask)]
    assert (idx >= 0).all() and (idx < n).all()
    # Each slot stays inside its stratum => globally non-decreasing.
    slots = np.arange(count, dtype=np.int64)
    assert (idx >= (slots * n) // count).all()
    assert (idx <= np.maximum((slots + 1) * n // count - 1,
                              (slots * n) // count)).all()
    assert (np.diff(idx) >= 0).all()
