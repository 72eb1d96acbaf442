"""icp_variants_tpu — a TPU-native scan-registration framework.

A from-scratch JAX/XLA/Pallas re-design of the full ICP-variants pipeline
(selection -> matching -> weighting -> rejection -> error metric -> minimizer)
from the Rusinkiewicz & Levoy taxonomy, with the same capabilities as the
reference C++ implementation (see /root/reference, cited per-module as
``file:line``) but architected TPU-first:

* point clouds are fixed-size padded device arrays with validity masks
  (no dynamic compaction),
* correspondence search is a tiled brute-force / grid k-NN Pallas kernel
  that rides the MXU, instead of a FLANN kd-tree,
* weighting + rejection are fused masked element-wise ops,
* the linear point-to-point / point-to-plane / symmetric solvers reduce to
  6x6 normal equations accumulated on-chip,
* the Ceres Levenberg-Marquardt path is replaced by a JAX Gauss-Newton/LM
  loop under ``lax.scan``,
* scan pairs / experiment configs distribute over a device mesh with
  ``shard_map`` + ``psum`` collectives.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compilation cache: ICP programs are large (scan + Pallas) and
# TPU compiles over this environment's tunnel are slow; caching makes every
# process after the first start in seconds. Override with ICP_TPU_JAX_CACHE
# (set to "0"/"off" to disable).
_cache = _os.environ.get(
    "ICP_TPU_JAX_CACHE",
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache"),
)
if _cache.lower() not in ("0", "off", ""):
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache)
    except Exception:
        pass

from icp_variants_tpu.api import RegistrationResult, register
from icp_variants_tpu.core.cloud import Cloud
from icp_variants_tpu.pipeline.config import (
    ICPConfig,
    Matching,
    Metric,
    Minimizer,
    Selection,
    Weighting,
)

__all__ = [
    "Cloud",
    "ICPConfig",
    "Matching",
    "Metric",
    "Minimizer",
    "RegistrationResult",
    "Selection",
    "Weighting",
    "register",
]
