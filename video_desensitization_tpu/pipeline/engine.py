"""The fused desensitization device program.

The reference hot loop (combine_detect.py:183-277) is: host-threaded image
load -> two GPU model calls in a 2-thread pool -> host merge of boxes ->
sequential CPU cv2 mosaic per box -> threaded save. Here the entire middle —
letterbox, both detector forwards, decode, NMS, letterbox-correction, pixel
scaling, box merge, and the mosaic remap — is ONE jitted XLA program per
(batch, H, W) signature: raw uint8 frames in, blurred uint8 frames + padded
detections out. Host code only does codec work and transfers.

Scaling: pass a ``parallel.make_mesh()`` mesh and the engine shards the frame
axis over ``data`` (frames are independent; zero cross-chip traffic at
inference).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from video_desensitization_tpu.detect.face import Retinaface
from video_desensitization_tpu.ops.mosaic import mosaic_boxes_batch
from video_desensitization_tpu.parallel.mesh import (
    batch_sharding,
    pad_batch_to_devices,
    replicated,
)


@dataclasses.dataclass
class EngineResult:
    frames: np.ndarray  # blurred uint8 (B, H, W, 3)
    face_boxes: list  # per-image list of [x1, y1, x2, y2] float pixel boxes
    plate_boxes: list
    num_faces: int
    num_plates: int


class DesensitizationEngine:
    def __init__(
        self,
        face_detector: Retinaface,
        plate_detector: Optional[Any] = None,
        mosaic_level: int = 8,
        mesh=None,
        mosaic_backend: str = "auto",
        anonymizer: str = "mosaic",
    ):
        """mosaic_backend: "pallas" (ops.pallas_mosaic strip kernel —
        box-area-proportional, bitwise-identical to the XLA path, 7-17x
        faster on chip), "xla" (scan-composed index remap; the only option
        off-TPU), or "auto" (pallas on TPU, xla elsewhere).

        anonymizer: "mosaic" (reference pixelation) or "gaussian"
        (ops.mosaic.gaussian_blur_boxes — separable depthwise blur)."""
        self.face = face_detector
        self.plate = plate_detector
        self.mosaic_level = mosaic_level
        self.mesh = mesh
        if mosaic_backend == "auto":
            mosaic_backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        self.mosaic_backend = mosaic_backend
        self.anonymizer = anonymizer
        program = self._build_program()
        if self.mesh is not None:
            # Collective-free data parallelism: each chip blurs its shard of
            # frames locally (see parallel.mesh.data_parallel_program).
            from video_desensitization_tpu.parallel.mesh import data_parallel_program

            program = data_parallel_program(
                self.mesh, program, n_params=2, n_batch_args=2, n_out=5
            )
        self._program = jax.jit(program)

    def _build_program(self):
        face = self.face
        plate = self.plate
        level = self.mosaic_level
        if self.anonymizer == "gaussian":
            from video_desensitization_tpu.ops.mosaic import gaussian_blur_boxes

            mosaic_fn = lambda f, b, v, _lvl: gaussian_blur_boxes(f, b, v)
        elif self.mosaic_backend == "pallas":
            from video_desensitization_tpu.ops.pallas_mosaic import (
                mosaic_boxes_batch_pallas as mosaic_fn,
            )
        else:
            mosaic_fn = mosaic_boxes_batch

        pallas_flat = None
        if self.mosaic_backend == "pallas" and self.anonymizer != "gaussian":
            from video_desensitization_tpu.ops.pallas_mosaic import (
                mosaic_boxes_batch_pallas_flat,
                pallas_mosaic_supported,
            )

            pallas_flat = (mosaic_boxes_batch_pallas_flat, pallas_mosaic_supported)

        def program(face_vars, plate_vars, frames_flat, image_shapes):
            # frames_flat: (B, H, W*3) channel-interleaved uint8. The flat
            # shape is the Pallas mosaic's native row-major operand layout;
            # tracing the whole program in it keeps XLA from inserting
            # full-frame layout copies around the kernel (profiles/r3b).
            b, h, w3 = frames_flat.shape
            w = w3 // 3
            frames_u8 = frames_flat.reshape(b, h, w, 3)
            face_dets, face_px, face_keep = face._detect_program(
                face_vars, frames_u8, image_shapes
            )
            fboxes = face_px[..., :4].astype(jnp.int32)
            if plate is not None:
                plate_px, plate_keep = plate._detect_program(
                    plate_vars, frames_u8, image_shapes
                )
                pboxes = plate_px[..., :4].astype(jnp.int32)
                boxes = jnp.concatenate([fboxes, pboxes], axis=1)
                valid = jnp.concatenate([face_keep, plate_keep], axis=1)
            else:
                plate_px = jnp.zeros((frames_u8.shape[0], 1, 6), jnp.float32)
                plate_keep = jnp.zeros((frames_u8.shape[0], 1), bool)
                boxes, valid = fboxes, face_keep
            if pallas_flat is not None and pallas_flat[1](h, w, level):
                blurred = pallas_flat[0](frames_flat, boxes, valid, w, level)
            else:
                blurred = mosaic_fn(frames_u8, boxes, valid, level).reshape(
                    b, h, w3
                )
            return blurred, face_px, face_keep, plate_px, plate_keep

        return program

    def process_batch(
        self, frames: np.ndarray, image_shapes: Optional[np.ndarray] = None
    ) -> EngineResult:
        """frames: uint8 (B, H, W, 3) RGB at native resolution."""
        b, h, w, _ = frames.shape
        if image_shapes is None:
            image_shapes = np.tile(np.array([[h, w]], np.float32), (b, 1))
        orig_b = b
        # Host-side reshape to the program's channel-interleaved flat form is
        # a free numpy view (C-contiguous input).
        frames_in = np.ascontiguousarray(frames).reshape(b, h, w * 3)
        shapes_in = image_shapes
        if self.mesh is not None:
            n = self.mesh.devices.size
            frames_in, _ = pad_batch_to_devices(frames_in, n)
            shapes_in, _ = pad_batch_to_devices(image_shapes, n)
            frames_in = jax.device_put(
                frames_in, batch_sharding(self.mesh, 3)
            )
            shapes_in = jax.device_put(shapes_in, batch_sharding(self.mesh, 2))

        plate_vars = self.plate.variables if self.plate is not None else None
        blurred, face_px, face_keep, plate_px, plate_keep = self._program(
            self.face.variables, plate_vars, jnp.asarray(frames_in), jnp.asarray(shapes_in)
        )
        blurred = np.asarray(blurred)[:orig_b].reshape(orig_b, h, w, 3)
        face_px = np.asarray(face_px)[:orig_b]
        face_keep = np.asarray(face_keep)[:orig_b]
        plate_px = np.asarray(plate_px)[:orig_b]
        plate_keep = np.asarray(plate_keep)[:orig_b]

        face_boxes = [face_px[i][face_keep[i]][:, :4].tolist() for i in range(orig_b)]
        plate_boxes = [
            plate_px[i][plate_keep[i]][:, :4].tolist() for i in range(orig_b)
        ]
        return EngineResult(
            frames=blurred,
            face_boxes=face_boxes,
            plate_boxes=plate_boxes,
            num_faces=int(face_keep.sum()),
            num_plates=int(plate_keep.sum()),
        )
