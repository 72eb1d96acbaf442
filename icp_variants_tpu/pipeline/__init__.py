from icp_variants_tpu.pipeline.config import (
    ICPConfig,
    Matching,
    Metric,
    Minimizer,
    Selection,
    Weighting,
)

__all__ = ["ICPConfig", "Matching", "Metric", "Minimizer", "Selection", "Weighting"]
