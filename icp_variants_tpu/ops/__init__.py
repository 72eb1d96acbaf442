from icp_variants_tpu.ops import knn, projective, rejection, selection, weighting

__all__ = ["knn", "projective", "rejection", "selection", "weighting"]
