"""Logging, stage timing, and profiling utilities."""

from video_desensitization_tpu.utils.logging import setup_logger
from video_desensitization_tpu.utils.timers import StageTimer

__all__ = ["setup_logger", "StageTimer"]
