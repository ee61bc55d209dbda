"""Inference wrappers with reference API parity."""

from video_desensitization_tpu.detect.face import Retinaface
from video_desensitization_tpu.detect.plate import PlateDetector

__all__ = ["Retinaface", "PlateDetector"]
