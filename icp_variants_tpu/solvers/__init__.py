from icp_variants_tpu.solvers import gauss_newton, linear, procrustes

__all__ = ["gauss_newton", "linear", "procrustes"]
