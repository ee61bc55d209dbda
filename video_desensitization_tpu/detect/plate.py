"""License-plate detector wrapper (YOLOv8 forward + decode + NMS on device).

Replaces the reference's external ultralytics call
(``plate_detector(batch_images, verbose=False, conf=0.5)``,
combine_detect.py:217) with a fused on-device program. Preprocessing follows
the ultralytics convention: aspect-preserving resize onto a 114-gray canvas,
/255 normalization; boxes are mapped back to original pixels by the exact
inverse transform.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from video_desensitization_tpu.models.convert import (
    convert_yolo_state_dict,
    load_torch_checkpoint,
    load_variables,
)
from video_desensitization_tpu.models.yolo import YoloV8
from video_desensitization_tpu.ops.image import letterbox_device, letterbox_params
from video_desensitization_tpu.ops.nms import batched_nms_padded

YOLO_PAD_VALUE = 114.0


class PlateDetector:
    def __init__(
        self,
        variables: Optional[Dict] = None,
        model_path: Optional[str] = None,
        num_classes: int = 1,
        variant: str = "n",
        confidence: float = 0.5,
        nms_iou: float = 0.7,
        input_shape=(640, 640),
        max_detections: int = 64,
        dtype=jnp.bfloat16,
        mesh=None,
    ):
        self.confidence = confidence
        self.nms_iou = nms_iou
        self.input_hw = (int(input_shape[0]), int(input_shape[1]))
        self.max_detections = max_detections
        self.mesh = mesh
        self.net = YoloV8(num_classes=num_classes, variant=variant, dtype=dtype)
        self.variables = (
            variables if variables is not None else self._load(model_path)
        )
        if mesh is not None:
            # Same collective-free data parallelism as detect.face.Retinaface
            # (shard_map over the data axis; see mesh.data_parallel_program).
            from video_desensitization_tpu.parallel.mesh import (
                data_parallel_program,
            )

            self._detect_jit = jax.jit(
                data_parallel_program(
                    mesh, self._detect_program, n_params=1, n_batch_args=2, n_out=2
                )
            )
        else:
            self._detect_jit = jax.jit(self._detect_program)

    def _load(self, model_path: Optional[str]) -> Dict:
        if model_path is None:
            # Jitted + device-resident for the same reason as face.py:_load.
            dummy = jnp.zeros((1, *self.input_hw, 3), jnp.float32)
            return dict(jax.jit(self.net.init)({"params": jax.random.PRNGKey(0)}, dummy))
        if str(model_path).endswith((".pt", ".pth")):
            return convert_yolo_state_dict(load_torch_checkpoint(model_path))
        return load_variables(model_path)

    def _detect_program(self, variables, frames_u8, image_shapes):
        """uint8 NHWC frames -> padded (B, K, 6) [x1,y1,x2,y2,score,cls] in
        original pixels + keep mask."""
        b, ih, iw, _ = frames_u8.shape
        h, w = self.input_hw
        # cv2-bit-exact integer letterbox when the host cv2 build's rounding
        # is recognized for this static geometry (ultralytics preprocesses
        # with cv2.resize INTER_LINEAR too); float fallback otherwise. One
        # selection point shared with the face path (ops.image).
        from video_desensitization_tpu.ops.image import letterbox_device_auto

        x = letterbox_device_auto(
            frames_u8, self.input_hw, pad_value=YOLO_PAD_VALUE
        )
        x = (x / 255.0).astype(self.net.dtype)
        boxes, probs = self.net.apply(variables, x, train=False)
        score = jnp.max(probs, axis=-1, keepdims=True)
        cls = jnp.argmax(probs, axis=-1, keepdims=True).astype(jnp.float32)
        dets = jnp.concatenate([boxes, score, cls], axis=-1)  # (B, A, 6)
        dets, keep = batched_nms_padded(
            dets, self.confidence, self.nms_iou, self.max_detections
        )
        # Undo the letterbox: static geometry since (ih, iw) is static.
        nh, nw, top, left = letterbox_params((ih, iw), (h, w))
        gain_x = iw / nw
        gain_y = ih / nh
        x1 = jnp.clip((dets[..., 0] - left) * gain_x, 0, iw)
        y1 = jnp.clip((dets[..., 1] - top) * gain_y, 0, ih)
        x2 = jnp.clip((dets[..., 2] - left) * gain_x, 0, iw)
        y2 = jnp.clip((dets[..., 3] - top) * gain_y, 0, ih)
        out = jnp.stack([x1, y1, x2, y2, dets[..., 4], dets[..., 5]], axis=-1)
        out = jnp.where(keep[..., None], out, jnp.zeros_like(out))
        return out, keep

    def _detect_letterboxed_program(
        self, variables, lb_frames_u8, image_shapes, lb_geom
    ):
        """Detect on frames already letterboxed to ``input_hw`` on the host.

        The link-optimal tiered pipeline (pipeline/throughput.py) letterboxes
        on the host (8.4x fewer bytes over the host->device link for 1080p)
        and shares ONE gray-128 canvas between both detectors. Here the pad
        region is re-filled with YOLO's 114 gray, and boxes are mapped back
        to original pixels by the inverse letterbox transform.

        lb_frames_u8: (B, h, w, 3) uint8, already letterboxed.
        image_shapes: (B, 2) float32 [orig_h, orig_w].
        lb_geom: (B, 4) float32 [nh, nw, top, left] — the HOST-computed
        geometry (ops.image.letterbox_geometry). Must not be re-derived on
        device: float32 floor can disagree with the host placement by one
        pixel for some source heights, shifting the 114-repad mask and the
        inverse-transform gain.
        """
        h, w = self.input_hw
        oh = image_shapes[:, 0:1]  # (B, 1)
        ow = image_shapes[:, 1:2]
        nh = lb_geom[:, 0:1]
        nw = lb_geom[:, 1:2]
        top = lb_geom[:, 2:3]
        left = lb_geom[:, 3:4]

        ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]  # (1, h, 1)
        xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]  # (1, 1, w)
        inside = (
            (ys >= top[:, :, None])
            & (ys < (top + nh)[:, :, None])
            & (xs >= left[:, :, None])
            & (xs < (left + nw)[:, :, None])
        )  # (B, h, w)
        x = jnp.where(
            inside[..., None], lb_frames_u8, jnp.uint8(int(YOLO_PAD_VALUE))
        )
        x = (x / 255.0).astype(self.net.dtype)
        boxes, probs = self.net.apply(variables, x, train=False)
        score = jnp.max(probs, axis=-1, keepdims=True)
        cls = jnp.argmax(probs, axis=-1, keepdims=True).astype(jnp.float32)
        dets = jnp.concatenate([boxes, score, cls], axis=-1)
        dets, keep = batched_nms_padded(
            dets, self.confidence, self.nms_iou, self.max_detections
        )
        gain_x = (ow / jnp.maximum(nw, 1.0))[:, :, None]  # (B, 1, 1)
        gain_y = (oh / jnp.maximum(nh, 1.0))[:, :, None]
        x1 = jnp.clip((dets[..., 0:1] - left[:, :, None]) * gain_x, 0, ow[:, :, None])
        y1 = jnp.clip((dets[..., 1:2] - top[:, :, None]) * gain_y, 0, oh[:, :, None])
        x2 = jnp.clip((dets[..., 2:3] - left[:, :, None]) * gain_x, 0, ow[:, :, None])
        y2 = jnp.clip((dets[..., 3:4] - top[:, :, None]) * gain_y, 0, oh[:, :, None])
        out = jnp.concatenate(
            [x1[..., 0:1], y1[..., 0:1], x2[..., 0:1], y2[..., 0:1],
             dets[..., 4:5], dets[..., 5:6]],
            axis=-1,
        )
        out = jnp.where(keep[..., None], out, jnp.zeros_like(out))
        return out, keep

    def get_map_txt(self, image: np.ndarray) -> np.ndarray:
        """Single-image detections for mAP eval: (M, 6) pixel coords
        [x1, y1, x2, y2, score, cls] — the plate-side analog of
        Retinaface.get_map_txt (reference face.py:185-230; the reference
        never shipped a plate evaluator at all)."""
        batch = np.asarray(image, np.uint8)[None]
        dets, keep = self.detect_padded(batch)
        return np.asarray(dets)[0][np.asarray(keep)[0]]

    def detect_padded(self, frames_u8: np.ndarray):
        b, h, w, _ = frames_u8.shape
        shapes = np.tile(np.array([[h, w]], np.float32), (b, 1))
        if self.mesh is not None:
            from video_desensitization_tpu.parallel.mesh import (
                batch_sharding,
                pad_batch_to_devices,
            )

            n = self.mesh.devices.size
            frames_u8, _ = pad_batch_to_devices(np.asarray(frames_u8), n)
            shapes, _ = pad_batch_to_devices(shapes, n)
            frames_u8 = jax.device_put(frames_u8, batch_sharding(self.mesh, 4))
            shapes = jax.device_put(shapes, batch_sharding(self.mesh, 2))
            dets, keep = self._detect_jit(self.variables, frames_u8, shapes)
            return dets[:b], keep[:b]
        return self._detect_jit(self.variables, jnp.asarray(frames_u8), jnp.asarray(shapes))

    def __call__(self, images, verbose: bool = False, conf: Optional[float] = None):
        """Reference-parity callable: list of RGB uint8 images ->
        list of (image, boxes) tuples (the format combine_detect.py:239
        expects)."""
        if not isinstance(images, (list, tuple)):
            images = [images]
        outputs = [None] * len(images)
        by_shape: Dict[Tuple[int, int], list] = {}
        for i, im in enumerate(images):
            by_shape.setdefault(im.shape[:2], []).append(i)
        for shape_hw, idxs in by_shape.items():
            batch = np.stack([np.asarray(images[i], np.uint8) for i in idxs])
            dets, keep = self.detect_padded(batch)
            dets, keep = np.asarray(dets), np.asarray(keep)
            if conf is not None:
                keep = keep & (dets[..., 4] >= conf)
            for row, i in enumerate(idxs):
                outputs[i] = (images[i], dets[row][keep[row]][:, :4].tolist())
        return outputs
