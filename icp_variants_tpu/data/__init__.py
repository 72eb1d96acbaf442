from icp_variants_tpu.data.loaders import BunnyDataLoader, DataLoader, Sample

__all__ = ["BunnyDataLoader", "DataLoader", "Sample"]
