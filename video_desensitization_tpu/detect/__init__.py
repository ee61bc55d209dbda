"""Inference wrappers with reference API parity."""

from video_desensitization_tpu.detect.face import Retinaface

__all__ = ["Retinaface"]
