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
    frames: np.ndarray  # blurred uint8: (B, H, W, 3) RGB, or (B, H*3/2, W)
    # planar I420 when produced by process_batch_yuv
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
        share_letterbox: bool = True,
    ):
        """mosaic_backend: "pallas" (ops.pallas_mosaic strip kernel —
        box-area-proportional, bitwise-identical to the XLA path, 7-17x
        faster on chip), "xla" (scan-composed index remap; the only option
        off-TPU), or "auto" (pallas on TPU, xla elsewhere).

        anonymizer: "mosaic" (reference pixelation) or "gaussian"
        (ops.mosaic.gaussian_blur_boxes — separable depthwise blur).

        share_letterbox: letterbox the batch ONCE into a shared uint8
        canvas consumed by both detectors (face sees it unchanged — its
        pad-128 convention; the plate program re-fills the pad region to
        YOLO's 114 gray elementwise), instead of each detector resizing
        the full-resolution batch independently. Bitwise-identical
        outputs; requires the cv2-exact resize formula for the geometry
        (auto-falls back to per-detector letterboxing otherwise)."""
        self.face = face_detector
        self.plate = plate_detector
        self.mosaic_level = mosaic_level
        self.mesh = mesh
        if mosaic_backend == "auto":
            mosaic_backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        self.mosaic_backend = mosaic_backend
        self.anonymizer = anonymizer
        self.share_letterbox = share_letterbox
        self._program, self._program_donated = self._finalize_program(
            self._build_program()
        )
        self._yuv_program = None  # built on first process_batch_yuv
        self._yuv_program_donated = None

    def _finalize_program(self, program):
        """Returns (plain_jit, donated_jit_or_None).

        The Pallas mosaic writes the blurred frames IN PLACE (input/output
        aliased), so a non-donated entry parameter forces XLA to insert a
        defensive full-frame copy (796 MB read+write at batch 128,
        benchmarks/profiles/r4 copy.702) before the kernel may clobber it.
        Production dispatch always feeds a freshly transferred buffer, so
        dispatch_batch uses the donated variant (hardware A/B: fused nobox
        686 -> 715 fps); ``program(donate=False)`` remains for callers that
        re-feed one resident buffer (profilers, ablations). Both jits are
        lazy — only the variant actually called is ever compiled. Donation
        is TPU-only: other backends ignore it with a warning per compile.
        """
        if self.mesh is not None:
            # Collective-free data parallelism: each chip blurs its shard of
            # frames locally (see parallel.mesh.data_parallel_program).
            from video_desensitization_tpu.parallel.mesh import data_parallel_program

            program = data_parallel_program(
                self.mesh, program, n_params=2, n_batch_args=2, n_out=5
            )
            return jax.jit(program), None
        donated = (
            jax.jit(program, donate_argnums=(2,))
            if jax.default_backend() == "tpu"
            else None
        )
        return jax.jit(program), donated

    def _build_program(self, yuv: bool = False):
        face = self.face
        plate = self.plate
        level = self.mosaic_level
        share = self.share_letterbox
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

        yuv_mosaic = None
        if yuv:
            from video_desensitization_tpu.ops.mosaic import (
                gaussian_blur_boxes,
                mosaic_i420_batch,
            )

            if self.anonymizer == "gaussian":
                # Blur each plane: Gaussian blending commutes with the affine
                # YUV<->RGB map; the chroma pass scales sigma/radius by the
                # lvl ratio so the full-res blur footprint matches Y's.
                def plane_fn(f, bx, vl, lvl, _lev=level):
                    s = lvl / max(1, _lev)
                    return gaussian_blur_boxes(
                        f, bx, vl, sigma=6.0 * s,
                        kernel_radius=max(1, round(12 * s)),
                    )

                yuv_mosaic = lambda fr, bx, vl: mosaic_i420_batch(
                    fr, bx, vl, level, plane_fn=plane_fn
                )
            elif self.mosaic_backend == "pallas":
                from video_desensitization_tpu.ops.pallas_mosaic import (
                    mosaic_i420_batch_pallas,
                )

                yuv_mosaic = lambda fr, bx, vl: mosaic_i420_batch_pallas(
                    fr, bx, vl, level
                )
            else:
                yuv_mosaic = lambda fr, bx, vl: mosaic_i420_batch(
                    fr, bx, vl, level
                )

        def program(face_vars, plate_vars, frames_flat, image_shapes):
            # frames_flat: (B, H, W*3) channel-interleaved uint8 — or, in
            # yuv mode, (B, H*3/2, W) planar I420. The flat shape is the
            # Pallas mosaic's native row-major operand layout; tracing the
            # whole program in it keeps XLA from inserting full-frame layout
            # copies around the kernel (profiles/r3b).
            if yuv:
                from video_desensitization_tpu.ops.yuv import i420_to_rgb_u8

                b, h15, w = frames_flat.shape
                h = (h15 * 2) // 3
                # Bit-exact cv2 conversion: detectors see the same pixels a
                # host cv2 pipeline would (tests/test_yuv.py, exhaustive).
                frames_u8 = i420_to_rgb_u8(frames_flat, h, w)
            else:
                b, h, w3 = frames_flat.shape
                w = w3 // 3
                frames_u8 = frames_flat.reshape(b, h, w, 3)
            canvas = None
            if share and (plate is None or plate.input_hw == face.input_hw):
                from video_desensitization_tpu.ops.image import (
                    letterbox_canvas_formula,
                    letterbox_canvas_u8,
                    letterbox_params,
                )

                formula = letterbox_canvas_formula((h, w), face.input_hw)
                if formula is not None:
                    canvas = letterbox_canvas_u8(
                        frames_u8, face.input_hw, formula=formula
                    )
                    lb_geom = jnp.broadcast_to(
                        jnp.asarray(
                            letterbox_params((h, w), face.input_hw),
                            jnp.float32,
                        ),
                        (frames_u8.shape[0], 4),
                    )
            # On the shared canvas, face's letterbox short-circuits to
            # identity (640x640 -> 640x640) so its program applies only the
            # mean-sub; letterbox_correction still maps boxes back to the
            # original pixels via image_shapes.
            face_in = canvas if canvas is not None else frames_u8
            face_dets, face_px, face_keep = face._detect_program(
                face_vars, face_in, image_shapes
            )
            fboxes = face_px[..., :4].astype(jnp.int32)
            if plate is not None:
                if canvas is not None:
                    plate_px, plate_keep = plate._detect_letterboxed_program(
                        plate_vars, canvas, image_shapes, lb_geom
                    )
                else:
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
            if yuv:
                blurred = yuv_mosaic(frames_flat, boxes, valid)
            elif pallas_flat is not None and pallas_flat[1](h, w, level):
                blurred = pallas_flat[0](frames_flat, boxes, valid, w, level)
            else:
                blurred = mosaic_fn(frames_u8, boxes, valid, level).reshape(
                    b, h, w * 3
                )
            return blurred, face_px, face_keep, plate_px, plate_keep

        return program

    def program(self, yuv: bool = False, donate: bool = False):
        """The jitted device program (the yuv variant builds lazily).

        For drivers that feed pre-transferred device-resident arrays and
        manage their own dispatch pipelining (bench.py, benchmarks/
        profile_device.py). Production callers use process_batch/
        process_batch_yuv or the dispatch_batch/finalize_batch split.
        Signature: program(face_vars, plate_vars, frames, image_shapes) ->
        (blurred, face_px, face_keep, plate_px, plate_keep).

        donate=True returns the frames-donating variant (see
        _finalize_program) when one exists for this backend/mesh — the
        caller's frames buffer is CONSUMED by the call and must not be
        reused. Falls back to the plain program otherwise.
        """
        if yuv:
            if self._yuv_program is None:
                self._yuv_program, self._yuv_program_donated = (
                    self._finalize_program(self._build_program(yuv=True))
                )
            plain, donated = self._yuv_program, self._yuv_program_donated
        else:
            plain, donated = self._program, self._program_donated
        return donated if (donate and donated is not None) else plain

    def dispatch_batch(
        self, frames: np.ndarray, image_shapes: Optional[np.ndarray] = None
    ):
        """Enqueue one device program asynchronously and return an opaque
        in-flight handle for :meth:`finalize_batch`.

        frames: uint8 (B, H, W, 3) RGB — or (B, H*3/2, W) planar I420,
        routed to the yuv program by rank. JAX dispatch is async, so a
        caller can keep several batches in flight (transfers and device
        compute overlap host decode/encode) and finalize in FIFO order —
        the shape bench.py's pipelined fused_device_fps measures.
        """
        yuv = frames.ndim == 3
        # The frames device buffer is freshly created from the host array
        # below and never reused, so dispatch always prefers the donating
        # program — it skips the defensive pre-mosaic full-frame copy
        # (686 -> 715 fps nobox on hardware; see _finalize_program).
        if yuv:
            b, h15, w = frames.shape
            h = (h15 * 2) // 3
            frames_in = np.ascontiguousarray(frames)
            program = self.program(yuv=True, donate=True)
        else:
            b, h, w, _ = frames.shape
            # Host-side reshape to the program's channel-interleaved flat
            # form is a free numpy view (C-contiguous input).
            frames_in = np.ascontiguousarray(frames).reshape(b, h, w * 3)
            program = self.program(donate=True)
        if image_shapes is None:
            image_shapes = np.tile(np.array([[h, w]], np.float32), (b, 1))
        elif self.share_letterbox and not np.all(
            np.asarray(image_shapes) == [h, w]
        ):
            # The shared-canvas program derives its letterbox geometry from
            # the STATIC frame-buffer shape; per-frame image_shapes only
            # drive the inverse box mapping. A caller claiming content
            # smaller than the buffer would letterbox pad pixels as content
            # on the shared path while the unshared path ignored the claim
            # — refuse rather than silently diverge.
            raise ValueError(
                "share_letterbox=True requires image_shapes == the frame "
                f"buffer shape {[h, w]}; got {np.asarray(image_shapes)[0]}. "
                "Crop/letterbox on the host first, or construct the engine "
                "with share_letterbox=False."
            )
        orig_b = b
        shapes_in = image_shapes
        if self.mesh is not None:
            n = self.mesh.devices.size
            frames_in, _ = pad_batch_to_devices(frames_in, n)
            shapes_in, _ = pad_batch_to_devices(image_shapes, n)
            frames_in = jax.device_put(frames_in, batch_sharding(self.mesh, 3))
            shapes_in = jax.device_put(shapes_in, batch_sharding(self.mesh, 2))

        plate_vars = self.plate.variables if self.plate is not None else None
        outputs = program(
            self.face.variables,
            plate_vars,
            jnp.asarray(frames_in),
            jnp.asarray(shapes_in),
        )
        return outputs, (orig_b, h, w, yuv)

    def finalize_batch(self, handle) -> EngineResult:
        """Fetch one in-flight dispatch (blocks on the device) and gather."""
        (blurred, face_px, face_keep, plate_px, plate_keep), meta = handle
        orig_b, h, w, yuv = meta
        frames = np.asarray(blurred)[:orig_b]
        if not yuv:
            frames = frames.reshape(orig_b, h, w, 3)
        return self._gather_result(
            frames, face_px, face_keep, plate_px, plate_keep, orig_b
        )

    def process_batch_yuv(
        self, yuv_frames: np.ndarray, image_shapes: Optional[np.ndarray] = None
    ) -> EngineResult:
        """Planar-YUV IO: half the link bytes of the RGB path, no colorspace
        roundtrip for the untouched pixels.

        yuv_frames: uint8 (B, H*3/2, W) planar I420 at native resolution —
        what a video decoder emits. Detectors run on a bit-exact cv2-style
        I420->RGB conversion on device; the mosaic is applied directly to
        the planes (Y full-res, U/V at half res — ops.mosaic.
        mosaic_i420_batch). ``EngineResult.frames`` is blurred I420 of the
        same shape, ready for an encoder.
        """
        assert yuv_frames.ndim == 3, yuv_frames.shape
        return self.finalize_batch(self.dispatch_batch(yuv_frames, image_shapes))

    def process_batch(
        self, frames: np.ndarray, image_shapes: Optional[np.ndarray] = None
    ) -> EngineResult:
        """frames: uint8 (B, H, W, 3) RGB at native resolution."""
        assert frames.ndim == 4, frames.shape
        return self.finalize_batch(self.dispatch_batch(frames, image_shapes))

    def _gather_result(
        self, frames, face_px, face_keep, plate_px, plate_keep, orig_b
    ) -> EngineResult:
        face_px = np.asarray(face_px)[:orig_b]
        face_keep = np.asarray(face_keep)[:orig_b]
        plate_px = np.asarray(plate_px)[:orig_b]
        plate_keep = np.asarray(plate_keep)[:orig_b]

        face_boxes = [face_px[i][face_keep[i]][:, :4].tolist() for i in range(orig_b)]
        plate_boxes = [
            plate_px[i][plate_keep[i]][:, :4].tolist() for i in range(orig_b)
        ]
        return EngineResult(
            frames=frames,
            face_boxes=face_boxes,
            plate_boxes=plate_boxes,
            num_faces=int(face_keep.sum()),
            num_plates=int(plate_keep.sum()),
        )
