"""Link-aware tiered pipeline: host letterbox -> device detect -> host mosaic.

The fully-fused engine (pipeline/engine.py) keeps raw frames HBM-resident and
runs detection + mosaic in one device program — optimal when host<->device
bandwidth is plentiful. On hosts where the link is the bottleneck (PCIe-
constrained or tunneled chips), moving raw 1080p frames both ways caps
throughput far below the chip's compute rate. This pipeline splits the work by
bytes-moved instead:

  host   : decode + letterbox to the 640x640 detector input (8.4x fewer bytes
           per 1080p frame over the link), threadpooled cv2
  device : ONE fused program = both detector forwards + decode + NMS +
           dynamic inverse-letterbox (face: Retinaface._detect_program on the
           pre-letterboxed canvas; plate: PlateDetector._detect_letterboxed_
           program repadding the shared canvas to YOLO gray)
  d->h   : padded pixel boxes + masks only (KBs per batch)
  host   : exact reference mosaic kernel per box (ops.mosaic.mosaic_host_
           reference — bitwise-identical blurred regions, cv2, ~0.1 ms/box)

Batches are double-buffered: batch N+1's letterbox and host->device transfer
overlap batch N's device compute (JAX dispatch is async; results are only
fetched one batch behind).

The reference's equivalent stage layout is the threaded hot loop at
combine_detect.py:183-277; this replaces its per-stage host/GPU round trips
with one async device program per batch and moves 120x fewer bytes out.
"""

from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from video_desensitization_tpu.detect.face import Retinaface
from video_desensitization_tpu.detect.plate import PlateDetector
from video_desensitization_tpu.ops.mosaic import mosaic_host_inplace


# In-flight batches per stage boundary for pipelined streaming. Measured on
# the tunneled chip via interleaved weather-matched A/Bs: 3 beat 2 by ~20%
# median, 5 beat 3 by ~6% median / 11% best, 8 was within noise of 5.
# RAM cost: each in-flight item pins its RAW frame batch (~6.2 MB/frame at
# 1080p) until finalize — peak ≈ (prefetch + depth + 2) × batch bytes.
DEFAULT_STREAM_DEPTH = 5

# Concurrent host->device copies in process_stream's transfer pool. In
# ISOLATION 3 concurrent synced copies beat a serial async-put stream 38 vs
# 33 MB/s on the tunneled chip (11 MB transfers — the batch-32 yuv420
# size). IN the pipeline the pool LOSES: interleaved weather-matched A/B at
# batch 32 measured tw=0 > tw=3 in all three matched pairs (53.5/38.8/53.6
# vs 39.2/14.5/41.1 fps) — each worker's completion sync is a d2h fetch
# that contends with the in-flight program stream, delaying dispatches by
# more than the copy overlap saves. Default stays 0 (serial puts inside
# the dispatch thread); the option remains for PCIe-class hosts where a
# sync is cheap. (Same A/B: batch 64 also lost to 32, 13-29 vs 39-54 fps.)
DEFAULT_TRANSFER_WORKERS = 0


@dataclasses.dataclass
class TieredResult:
    frames: np.ndarray  # blurred uint8 (B, H, W, 3), host-mosaicked
    face_boxes: List[List[List[float]]]
    plate_boxes: List[List[List[float]]]
    num_faces: int
    num_plates: int


def letterbox_u8(frame: np.ndarray, dst_hw: Tuple[int, int]) -> np.ndarray:
    """Reference-geometry letterbox onto a uint8 gray-128 canvas (cv2)."""
    import cv2

    from video_desensitization_tpu.ops.image import letterbox_params

    ih, iw = frame.shape[:2]
    h, w = dst_hw
    nh, nw, top, left = letterbox_params((ih, iw), (h, w))
    canvas = np.full((h, w, 3), 128, np.uint8)
    canvas[top : top + nh, left : left + nw] = cv2.resize(frame, (nw, nh))
    return canvas


def resize_content_u8(frame: np.ndarray, dst_hw: Tuple[int, int]) -> np.ndarray:
    """Resize to letterbox content size WITHOUT the gray canvas (cv2).

    For a 16:9 source and a square detector input, the gray pad is ~44% of
    the canvas bytes; sending only the (nh, nw) content and padding on device
    cuts host->device traffic accordingly. The device pad (uint8 128,
    centered) reproduces ``letterbox_u8`` exactly.
    """
    import cv2

    from video_desensitization_tpu.ops.image import letterbox_params

    ih, iw = frame.shape[:2]
    nh, nw, _, _ = letterbox_params((ih, iw), dst_hw)
    return cv2.resize(frame, (nw, nh))


def rgb_to_i420(content: np.ndarray) -> np.ndarray:
    """RGB content -> planar I420 bytes, (nh*3/2, nw) uint8 (cv2 BT.601)."""
    import cv2

    return cv2.cvtColor(content, cv2.COLOR_RGB2YUV_I420)


def i420_to_rgb_device(yuv, nh: int, nw: int):
    """Device-side I420 -> RGB float32, matching cv2's conversion.

    cv2's I420 path is video-range ITU-R BT.601: R = 1.164(Y-16) +
    1.596(V-128), G = 1.164(Y-16) - 0.391(U-128) - 0.813(V-128),
    B = 1.164(Y-16) + 2.018(U-128) (coefficients verified against
    cv2.cvtColor numerically). Chroma upsamples by 2x replication. The U/V
    planes are sliced by flat offset, not rows, so any even nh works.
    yuv: (B, nh*3/2, nw) uint8 -> (B, nh, nw, 3) float32 in [0, 255].
    """
    b = yuv.shape[0]
    y = yuv[:, :nh, :].astype(jnp.float32)
    h2, w2 = nh // 2, nw // 2
    tail = yuv[:, nh:, :].reshape(b, (nh // 2) * nw)
    u = tail[:, : h2 * w2].reshape(b, h2, w2).astype(jnp.float32) - 128.0
    v = tail[:, h2 * w2 :].reshape(b, h2, w2).astype(jnp.float32) - 128.0
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2)
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
    yy = 1.1644 * (y - 16.0)
    r = yy + 1.596 * v
    g = yy - 0.391 * u - 0.813 * v
    bl = yy + 2.018 * u
    return jnp.clip(jnp.stack([r, g, bl], axis=-1), 0.0, 255.0)


class TieredPipeline:
    def __init__(
        self,
        face_detector: Retinaface,
        plate_detector: Optional[PlateDetector] = None,
        mosaic_level: int = 8,
        letterbox_workers: int = 6,
        transfer: str = "rgb",
        anonymizer: str = "mosaic",
    ):
        """transfer: "rgb" sends (nh, nw, 3) letterbox content; "yuv420"
        sends planar I420 (nh*3/2, nw) — half the bytes over the link. The
        source streams are H.265 YUV 4:2:0, so re-subsampling chroma loses
        nothing the codec stored; the device converts back with BT.601.
        yuv420 requires even content dims (true for 16:9/4:3 at 640).

        anonymizer: "mosaic" (reference pixelation, bit-exact) or
        "gaussian" (softer cv2 blur — same option the fused engine offers)."""
        self.face = face_detector
        self.plate = plate_detector
        self.mosaic_level = mosaic_level
        self.anonymizer = anonymizer
        if anonymizer == "gaussian":
            from video_desensitization_tpu.ops.mosaic import (
                gaussian_blur_host_inplace,
            )

            self._blur = gaussian_blur_host_inplace
        elif anonymizer == "mosaic":
            self._blur = lambda im, bx: mosaic_host_inplace(im, bx, mosaic_level)
        else:
            raise ValueError(
                f"anonymizer must be 'mosaic' or 'gaussian', got {anonymizer!r}"
            )
        self.input_hw = face_detector.input_hw
        self.transfer = transfer
        self._pool = ThreadPoolExecutor(max_workers=letterbox_workers)
        self._program = jax.jit(self._build_program())

    def _build_program(self):
        face = self.face
        plate = self.plate
        h, w = self.input_hw
        transfer = self.transfer

        def program(face_vars, plate_vars, content_u8, aux):
            # Rebuild the gray-128 letterbox canvas on device: the host sends
            # only the resized content (pad geometry is static under jit).
            # ``aux`` packs [image_shapes (2) | lb_geom (4)] as one (B, 6)
            # transfer, and the four logical outputs are packed into ONE
            # (B, Kf*16 + Kp*7) float32 array: on a latency-bound link every
            # separate h2d/d2h transfer costs a full round trip, so the per-
            # batch link cost is 1 RTT each way instead of 3 + 4.
            image_shapes = aux[:, :2]
            lb_geom = aux[:, 2:]
            if transfer == "yuv420":
                _, rows15, cw = content_u8.shape
                ch = rows15 * 2 // 3
                content = i420_to_rgb_device(content_u8, ch, cw)
            else:
                _, ch, cw, _ = content_u8.shape
                content = content_u8
            top, left = (h - ch) // 2, (w - cw) // 2
            lb_frames_u8 = jnp.pad(
                content,
                ((0, 0), (top, h - ch - top), (left, w - cw - left), (0, 0)),
                constant_values=jnp.asarray(128, content.dtype),
            )
            _, face_px, face_keep = face._detect_program(
                face_vars, lb_frames_u8, image_shapes
            )
            if plate is not None:
                plate_px, plate_keep = plate._detect_letterboxed_program(
                    plate_vars, lb_frames_u8, image_shapes, lb_geom
                )
            else:
                plate_px = jnp.zeros((lb_frames_u8.shape[0], 1, 6), jnp.float32)
                plate_keep = jnp.zeros((lb_frames_u8.shape[0], 1), bool)
            b = lb_frames_u8.shape[0]
            return jnp.concatenate(
                [
                    face_px.reshape(b, -1),
                    face_keep.astype(jnp.float32),
                    plate_px.reshape(b, -1),
                    plate_keep.astype(jnp.float32),
                ],
                axis=1,
            )

        return program

    def _unpack(self, flat: np.ndarray):
        """Inverse of the program's output packing -> (face_px, face_keep,
        plate_px, plate_keep) numpy views."""
        b = flat.shape[0]
        kf = self.face.max_detections
        kp = self.plate.max_detections if self.plate is not None else 1
        o1 = kf * 15
        o2 = o1 + kf
        o3 = o2 + kp * 6
        return (
            flat[:, :o1].reshape(b, kf, 15),
            flat[:, o1:o2] > 0.5,
            flat[:, o2:o3].reshape(b, kp, 6),
            flat[:, o3:] > 0.5,
        )

    # -- stages ---------------------------------------------------------------
    def letterbox_batch(self, frames: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) uint8 -> letterbox content batch, threadpooled.

        Only the letterbox *content* is produced ((B, nh, nw, 3) uint8 RGB,
        or (B, nh*3/2, nw) planar I420 in yuv420 mode); the device program
        converts/pads to the square canvas (see _build_program).
        """
        if self.transfer == "yuv420":
            def one(f):
                c = resize_content_u8(f, self.input_hw)
                nh, nw = c.shape[:2]
                if nh % 2 or nw % 2:
                    raise ValueError(
                        f"yuv420 transfer needs even letterbox content dims, "
                        f"got {nh}x{nw}; use transfer='rgb' for this source"
                    )
                return rgb_to_i420(c)
            return np.stack(list(self._pool.map(one, frames)))
        return np.stack(
            list(
                self._pool.map(
                    lambda f: resize_content_u8(f, self.input_hw), frames
                )
            )
        )

    def dispatch(self, lb_frames, image_shapes: np.ndarray):
        """Async: enqueue transfer + device program; returns a device future
        (ONE packed output array — see _build_program).

        ``lb_frames`` may be a host array (transferred here) or an already
        device-resident array (see the transfer stage in process_stream)."""
        from video_desensitization_tpu.ops.image import letterbox_geometry

        plate_vars = self.plate.variables if self.plate is not None else None
        geom = letterbox_geometry(image_shapes, self.input_hw)
        aux = np.concatenate(
            [np.asarray(image_shapes, np.float32), np.asarray(geom, np.float32)],
            axis=1,
        )
        return self._program(
            self.face.variables,
            plate_vars,
            jnp.asarray(lb_frames),
            jnp.asarray(aux),
        )

    def finalize(self, frames: np.ndarray, device_out) -> TieredResult:
        """Fetch detections (one transfer) and apply the exact reference
        mosaic on host."""
        face_px, face_keep, plate_px, plate_keep = self._unpack(
            np.asarray(device_out)
        )
        b = frames.shape[0]
        face_boxes, plate_boxes, merged_all = [], [], []
        for i in range(b):
            fb = face_px[i][face_keep[i]][:, :4]
            pb = plate_px[i][plate_keep[i]][:, :4]
            face_boxes.append(fb.tolist())
            plate_boxes.append(pb.tolist())
            merged_all.append(np.concatenate([fb, pb], axis=0).astype(np.int64).tolist())
        # Frames are independent; cv2 releases the GIL, so mosaic in parallel.
        # One copy per frame into a preallocated output, then in-place box
        # work: the previous copy-then-np.stack pattern paid TWO full-frame
        # memcpys per 1080p frame — as expensive as the mosaic itself
        # (stage_breakdown.py measured the host mosaic stage at 370 ms/batch
        # of a ~900 ms cycle).
        out = np.empty_like(frames)
        def _one(i):
            np.copyto(out[i], frames[i])
            self._blur(out[i], merged_all[i])
        list(self._pool.map(_one, range(b)))
        return TieredResult(
            frames=out,
            face_boxes=face_boxes,
            plate_boxes=plate_boxes,
            num_faces=int(face_keep.sum()),
            num_plates=int(plate_keep.sum()),
        )

    # -- async batch split ------------------------------------------------
    def dispatch_batch(self, frames: np.ndarray):
        """Async half of :meth:`process_batch`: letterbox on the host pool,
        then enqueue transfer + device program without waiting for results.

        Returns an opaque handle for :meth:`finalize_batch`. This is the
        same dispatch/finalize contract the fused engine exposes — it lets
        wrappers that manage their own in-flight window (TrackingEngine's
        keyframe batches, multicam's dispatch thread) keep several tiered
        batches in flight so device detection overlaps host mosaic work.
        """
        b, h, w, _ = frames.shape
        shapes = np.tile(np.array([[h, w]], np.float32), (b, 1))
        lb = self.letterbox_batch(frames)
        return frames, self.dispatch(lb, shapes)

    def finalize_batch(self, handle) -> TieredResult:
        """Fetch one in-flight :meth:`dispatch_batch` (blocks) and mosaic."""
        frames, fut = handle
        return self.finalize(frames, fut)

    # -- synchronous convenience ---------------------------------------------
    def process_batch(self, frames: np.ndarray) -> TieredResult:
        return self.finalize_batch(self.dispatch_batch(frames))

    # -- pipelined stream -------------------------------------------------
    def process_stream(
        self,
        batches: Iterable[np.ndarray],
        depth: int = DEFAULT_STREAM_DEPTH,
        transfer_workers: int = DEFAULT_TRANSFER_WORKERS,
    ) -> Iterator[TieredResult]:
        """Pipeline an iterable of uint8 NHWC batches through overlapped
        stages:

          main thread    : letterbox batch N+1 (cv2 pool, GIL released)
          transfer pool  : (``transfer_workers`` > 0 only) host->device copy
                           of up to that many batches CONCURRENTLY, each
                           synced on completion. Measured a net LOSS on the
                           tunneled chip (see DEFAULT_TRANSFER_WORKERS) —
                           off by default; available for hosts where a
                           completion sync doesn't fight the program stream.
          dispatch thread: host->device transfer (when the pool is off) +
                           program enqueue of batch N, in order
          finalize thread: device fetch + host mosaic of batch N-1

        Keeps up to ``depth`` batches in flight at each stage boundary;
        results come back in order.
        """
        import queue as _queue
        import threading as _threading

        work_q: "_queue.Queue" = _queue.Queue(maxsize=depth)
        out_q: "_queue.Queue" = _queue.Queue()
        finalizer = ThreadPoolExecutor(max_workers=1)
        xfer = (
            ThreadPoolExecutor(max_workers=transfer_workers)
            if transfer_workers > 0
            else None
        )
        _DONE = object()

        def _put_synced(lb: np.ndarray):
            x = jax.device_put(lb)
            np.asarray(x[:1])  # force the copy (block_until_ready unreliable
            # on the axon platform); syncing INSIDE the pool is what lets the
            # next transfer overlap this one's round trip.
            return x

        def dispatcher():
            try:
                while True:
                    item = work_q.get()
                    if item is _DONE:
                        out_q.put(_DONE)
                        return
                    frames, lb, shapes = item
                    if xfer is not None:
                        lb = lb.result()  # device array from the transfer pool
                    fut = self.dispatch(lb, shapes)
                    out_q.put(finalizer.submit(self.finalize, frames, fut))
            except BaseException as e:  # noqa: BLE001
                out_q.put(e)

        t = _threading.Thread(target=dispatcher, daemon=True)
        t.start()
        in_flight = 0

        def _drain_one():
            nonlocal in_flight
            got = out_q.get()
            if isinstance(got, BaseException):
                raise got
            assert got is not _DONE
            in_flight -= 1
            return got.result()

        try:
            for frames in batches:
                b, h, w, _ = frames.shape
                shapes = np.tile(np.array([[h, w]], np.float32), (b, 1))
                lb = self.letterbox_batch(frames)
                lb_item = xfer.submit(_put_synced, lb) if xfer else lb
                work_q.put((frames, lb_item, shapes))
                in_flight += 1
                if in_flight > depth:
                    yield _drain_one()
            work_q.put(_DONE)
            while in_flight:
                yield _drain_one()
            got = out_q.get()
            if isinstance(got, BaseException):
                raise got
        finally:
            # Unblock the dispatcher on early generator close.
            try:
                work_q.put_nowait(_DONE)
            except _queue.Full:
                pass
            finalizer.shutdown(wait=False)
            if xfer is not None:
                xfer.shutdown(wait=False)
