"""Flax detection models: RetinaFace (face) and YOLO (license plate)."""

from video_desensitization_tpu.models.configs import cfg_mnet, cfg_re50, get_config
from video_desensitization_tpu.models.retinaface import RetinaFace

__all__ = ["RetinaFace", "cfg_mnet", "cfg_re50", "get_config"]
