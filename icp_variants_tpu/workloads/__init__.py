from icp_variants_tpu.workloads import bunny

__all__ = ["bunny"]
