from fem_tpu.golden.model import GoldenMapper, MappingStats

__all__ = ["GoldenMapper", "MappingStats"]
