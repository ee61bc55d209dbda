"""Orchestration: fused device engine, tiered pipeline, batch/video/record
jobs, and the resident watch-folder service."""

from video_desensitization_tpu.pipeline.engine import DesensitizationEngine
from video_desensitization_tpu.pipeline.service import (
    DesensitizationService,
    ServiceConfig,
)
from video_desensitization_tpu.pipeline.throughput import TieredPipeline
from video_desensitization_tpu.pipeline.tracking import TrackingEngine

__all__ = [
    "DesensitizationEngine",
    "DesensitizationService",
    "ServiceConfig",
    "TieredPipeline",
    "TrackingEngine",
]
