"""Training: multibox target assignment, losses, and the sharded train step.

The reference ships inference-only (weights trained elsewhere; face.py:50-58
just loads a .pth). A complete framework needs the training path too: this
implements the standard RetinaFace multibox objective (smooth-L1 box +
landmark regression with center-variance encoding, cross-entropy with hard
negative mining) and a pjit train step sharded over a (data, model) mesh.
"""

from video_desensitization_tpu.train.targets import encode_boxes, encode_landmarks, match_anchors
from video_desensitization_tpu.train.losses import multibox_loss
from video_desensitization_tpu.train.step import TrainState, create_train_state, make_train_step

__all__ = [
    "encode_boxes",
    "encode_landmarks",
    "match_anchors",
    "multibox_loss",
    "TrainState",
    "create_train_state",
    "make_train_step",
]
