from icp_variants_tpu.parallel import sharded_icp

__all__ = ["sharded_icp"]
