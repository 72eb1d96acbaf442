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
