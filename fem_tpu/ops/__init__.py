from fem_tpu.ops.types import DeviceIndex, FilterParams

__all__ = ["DeviceIndex", "FilterParams"]
