from icp_variants_tpu.ops import (
    kdtree,
    knn,
    normals,
    projective,
    rejection,
    selection,
    weighting,
)

__all__ = [
    "kdtree",
    "knn",
    "normals",
    "projective",
    "rejection",
    "selection",
    "weighting",
]
