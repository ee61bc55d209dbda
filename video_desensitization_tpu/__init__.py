"""TPU-native video desensitization framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
``xdu-Liu-learn/Video-desensitization``: Apollo Cyber RT ``.record`` ingestion,
RetinaFace face detection + YOLO license-plate detection as batched on-device
forward passes, per-ROI pixelation via fused device kernels, and HEVC
re-encode/repack — designed TPU-first (static shapes, NHWC, bfloat16 matmuls,
device-mesh sharding) rather than as a port of the reference's CUDA/torch code.

Layer map (mirrors SURVEY.md §1, reimagined for TPU):
  ops/       closed-form device math: anchors, box decode, padded NMS,
             letterbox, mosaic remap (XLA + Pallas)
  models/    Flax RetinaFace (resnet50 / mobilenet0.25) and YOLOv8-style
             plate detector; torch checkpoint converters
  detect/    API-parity inference wrappers (Retinaface.detect_images, ...)
  parallel/  device mesh + sharding: the explicit communication layer
  video/     frame/codec I/O (native libav layer + OpenCV fallback)
  record/    Apollo cyber_record container read/write, packet repair, repack
  pipeline/  orchestration: batch processing, per-video pipeline, streaming
  train/     multibox loss + sharded train step (dp/model axes)
  api/, cli/ config.ini-compatible config and combine_detect-parity CLI
"""

__version__ = "0.1.0"
