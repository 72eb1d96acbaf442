from icp_variants_tpu.core.cloud import Cloud
from icp_variants_tpu.core import se3

__all__ = ["Cloud", "se3"]
