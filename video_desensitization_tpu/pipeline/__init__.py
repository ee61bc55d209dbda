"""Orchestration: fused device engine, tiered pipeline, batch/video/record jobs."""

from video_desensitization_tpu.pipeline.engine import DesensitizationEngine
from video_desensitization_tpu.pipeline.throughput import TieredPipeline

__all__ = ["DesensitizationEngine", "TieredPipeline"]
