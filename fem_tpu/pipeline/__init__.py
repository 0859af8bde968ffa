from fem_tpu.pipeline.engine import MappingEngine

__all__ = ["MappingEngine"]
