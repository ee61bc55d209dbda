"""Orchestration: fused device engine, batch/video/record pipelines."""

from video_desensitization_tpu.pipeline.engine import DesensitizationEngine

__all__ = ["DesensitizationEngine"]
