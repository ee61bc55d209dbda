"""Retinaface inference wrapper — API parity with the reference class
(detect_face/face.py:14-230) on a TPU-native execution model.

Parity surface: constructor kwargs (``model_path``, ``backbone``,
``confidence``, ``nms_iou``, ``input_shape``, ``letterbox_image``),
``detect_images(images) -> list[(image, boxes)]``, ``get_FPS``,
``get_map_txt``. Differences by design:

* The whole per-batch pipeline — letterbox, mean-sub, forward, decode,
  softmax-confidence, NMS, letterbox-correction — is ONE jitted XLA program
  per (batch, H, W) signature; no per-stage host round trips (the reference
  crosses host<->device twice per batch and runs python-loop NMS).
* Instead of ``cuda=True`` there is ``dtype`` (bfloat16 compute by default on
  TPU) and sharding hooks: pass a ``mesh`` to shard the batch over the
  ``data`` axis (the TPU equivalent of the reference's nn.DataParallel,
  face.py:56).
* Results are padded (K, 15) + mask device-side and converted to the
  reference's variable-length list format at the API boundary.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from video_desensitization_tpu.models.configs import get_config
from video_desensitization_tpu.models.retinaface import RetinaFace as RetinaFaceNet
from video_desensitization_tpu.models.convert import (
    convert_retinaface_state_dict,
    load_torch_checkpoint,
    load_variables,
)
from video_desensitization_tpu.ops.anchors import generate_anchors
from video_desensitization_tpu.ops.boxes import (
    decode_boxes,
    decode_landmarks,
    letterbox_correction,
    scale_to_pixels,
)
from video_desensitization_tpu.ops.image import preprocess_batch_device
from video_desensitization_tpu.ops.nms import batched_nms_padded


class Retinaface:
    """Batched RetinaFace detector on TPU."""

    _defaults = {
        "model_path": None,
        "backbone": "resnet50",
        "confidence": 0.5,
        "nms_iou": 0.45,
        "input_shape": [1280, 1280, 3],
        "letterbox_image": True,
        "max_detections": 128,
        "dtype": jnp.bfloat16,
        "mesh": None,
    }

    @classmethod
    def get_defaults(cls, n):
        return cls._defaults.get(n, f"Unrecognized attribute name '{n}'")

    def __init__(self, variables: Optional[Dict] = None, **kwargs):
        self.__dict__.update(self._defaults)
        for name, value in kwargs.items():
            setattr(self, name, value)

        self.cfg = get_config(self.backbone)
        self.input_hw = (int(self.input_shape[0]), int(self.input_shape[1]))
        self.anchors = jnp.asarray(
            generate_anchors(
                self.input_hw,
                min_sizes=self.cfg["min_sizes"],
                steps=self.cfg["steps"],
                clip=self.cfg["clip"],
            )
        )
        self.net = RetinaFaceNet(cfg=self.cfg, mode="eval", dtype=self.dtype)
        self.variables = variables if variables is not None else self._load(self.model_path)
        if self.mesh is not None:
            # shard_map over the data axis: each chip runs its shard of the
            # batch independently (frames are independent), so the compiled
            # program carries zero collectives (see mesh.data_parallel_program).
            from video_desensitization_tpu.parallel.mesh import data_parallel_program

            self._detect_fn = jax.jit(
                data_parallel_program(
                    self.mesh, self._detect_program, n_params=1, n_batch_args=2, n_out=3
                )
            )
        else:
            self._detect_fn = jax.jit(partial(self._detect_program))

    # -- weights -----------------------------------------------------------
    def _load(self, model_path: Optional[str]) -> Dict:
        if model_path is None:
            # Random init (benchmark / smoke-test mode; real use converts a
            # checkpoint offline via models.convert). One jitted program and
            # device-resident output: unjitted Flax init dispatches every op
            # separately (hundreds of host round trips), and a numpy copy
            # would force the whole tree back over the link only to be
            # re-uploaded on the first detect call.
            dummy = jnp.zeros((1, *self.input_hw, 3), jnp.float32)
            return dict(jax.jit(self.net.init)({"params": jax.random.PRNGKey(0)}, dummy))
        if str(model_path).endswith((".pth", ".pt")):
            return convert_retinaface_state_dict(load_torch_checkpoint(model_path))
        return load_variables(model_path)

    # -- fused device program ------------------------------------------------
    def _detect_program(self, variables, frames_u8, image_shapes):
        """uint8 NHWC frames -> padded corrected detections, all on device."""
        x = preprocess_batch_device(frames_u8, self.input_hw, dtype=self.dtype)
        loc, conf, landm = self.net.apply(variables, x, train=False)
        loc = loc.astype(jnp.float32)
        conf = conf.astype(jnp.float32)
        landm = landm.astype(jnp.float32)
        boxes = decode_boxes(loc, self.anchors, self.cfg["variance"])
        landms = decode_landmarks(landm, self.anchors, self.cfg["variance"])
        dets = jnp.concatenate([boxes, conf[..., 1:2], landms], axis=-1)
        dets, keep = batched_nms_padded(
            dets, self.confidence, self.nms_iou, self.max_detections
        )
        if self.letterbox_image:
            dets = letterbox_correction(dets, self.input_hw, image_shapes)
            dets = jnp.where(keep[..., None], dets, jnp.zeros_like(dets))
        dets_px = scale_to_pixels(dets, image_shapes)
        return dets, dets_px, keep

    def detect_padded(
        self, frames_u8: np.ndarray, image_shapes: Optional[np.ndarray] = None
    ):
        """Device-native interface: (B,H,W,3) uint8 -> (dets_norm, dets_px, keep).

        ``image_shapes`` defaults to the frame shape (use when frames are
        already at native resolution).
        """
        b, h, w, _ = frames_u8.shape
        if image_shapes is None:
            image_shapes = np.tile(np.array([[h, w]], np.float32), (b, 1))
        frames_in, shapes_in = self._prepare_inputs(frames_u8, image_shapes)
        dets, dets_px, keep = self._detect_fn(self.variables, frames_in, shapes_in)
        if self.mesh is not None:
            return dets[:b], dets_px[:b], keep[:b]
        return dets, dets_px, keep

    def _prepare_inputs(self, frames_u8, image_shapes):
        """Device-put inputs; on a mesh, pad dim 0 to the device count and
        shard over ``data`` (the shard_mapped program requires divisibility)."""
        if self.mesh is None:
            return jnp.asarray(frames_u8), jnp.asarray(image_shapes)
        from video_desensitization_tpu.parallel.mesh import (
            batch_sharding,
            pad_batch_to_devices,
        )

        n = self.mesh.devices.size
        frames_u8, _ = pad_batch_to_devices(np.asarray(frames_u8), n)
        image_shapes, _ = pad_batch_to_devices(np.asarray(image_shapes), n)
        return (
            jax.device_put(frames_u8, batch_sharding(self.mesh, 4)),
            jax.device_put(image_shapes, batch_sharding(self.mesh, 2)),
        )

    # -- reference-parity API -------------------------------------------------
    def detect_images(
        self, images: Sequence[np.ndarray]
    ) -> List[Tuple[np.ndarray, List[List[float]]]]:
        """list of HWC RGB uint8 arrays -> list of (image, [x1,y1,x2,y2] boxes).

        Images of mixed sizes are letterboxed on device per the configured
        input shape; box outputs are in original pixel coordinates
        (reference face.py:120-150 contract).
        """
        if not isinstance(images, (list, tuple)):
            images = [images]
        # Group identically-shaped images to share one compiled program.
        outputs: List = [None] * len(images)
        by_shape: Dict[Tuple[int, int], List[int]] = {}
        for i, im in enumerate(images):
            by_shape.setdefault(im.shape[:2], []).append(i)
        for shape_hw, idxs in by_shape.items():
            batch = np.stack([np.asarray(images[i], np.uint8) for i in idxs])
            _, dets_px, keep = self.detect_padded(batch)
            dets_px = np.asarray(dets_px)
            keep = np.asarray(keep)
            for row, i in enumerate(idxs):
                boxes = dets_px[row][keep[row]][:, :4].tolist()
                outputs[i] = (images[i], boxes)
        return outputs

    def get_FPS(self, image: np.ndarray, test_interval: int = 100) -> float:
        """Reference-parity microbenchmark: mean seconds per forward
        (10 warmup + test_interval timed; face.py:155-180)."""
        batch = np.asarray(image, np.uint8)[None]
        shapes = np.array([[batch.shape[1], batch.shape[2]]], np.float32)
        args = (self.variables, *self._prepare_inputs(batch, shapes))
        for _ in range(10):
            jax.block_until_ready(self._detect_fn(*args))
        t1 = time.time()
        for _ in range(test_interval):
            jax.block_until_ready(self._detect_fn(*args))
        return (time.time() - t1) / test_interval

    def get_map_txt(self, image: np.ndarray) -> np.ndarray:
        """Single-image detections for mAP eval: (M, 15) pixel coords with
        landmarks scaled too (reference face.py:185-230)."""
        batch = np.asarray(image, np.uint8)[None]
        _, dets_px, keep = self.detect_padded(batch)
        return np.asarray(dets_px)[0][np.asarray(keep)[0]]
