from fem_tpu.utils.metrics import PipelineMetrics, Timer

__all__ = ["PipelineMetrics", "Timer"]
