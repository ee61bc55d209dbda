"""Multi-camera co-batching: frames from many streams share device batches.

The reference fans record topics across a thread pool but runs each video's
GPU work separately (recordDeal.so per-topic ThreadPoolExecutor; SURVEY.md
§2 parallelism table). TPU-native, the right shape is the opposite: decode
all camera streams concurrently on the host, co-batch their frames into one
device batch stream (frames are independent — a batch may mix cameras), and
demux blurred frames back to per-camera encoders. One compiled program, one
steady device pipeline, N codecs.

Frames are grouped by resolution (a camera's resolution is fixed, so
per-camera ordering survives FIFO batching within its group).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from video_desensitization_tpu.utils.logging import get_logger
from video_desensitization_tpu.video.av import HEVC_DEFAULTS, VideoDecoder, VideoEncoder

_DONE = object()


@dataclass
class CameraStats:
    frames: int = 0
    faces: int = 0
    plates: int = 0


def process_videos_cobatched(
    jobs: Dict[str, Tuple[str, str]],
    engine,
    batch_size: int = 16,
    fps: Optional[float] = None,
    codec: Optional[str] = None,
    queue_depth: int = 64,
) -> Dict[str, CameraStats]:
    """Desensitize many videos through one shared device batch stream.

    jobs: {camera_name: (input_path, output_path)}. Returns per-camera
    stats. Encoder codec defaults per output extension (see streaming.py).
    """
    log = get_logger("multicam")
    frame_q: "queue.Queue" = queue.Queue(maxsize=queue_depth)
    enc_qs: Dict[str, "queue.Queue"] = {
        cam: queue.Queue(maxsize=queue_depth) for cam in jobs
    }
    stats = {cam: CameraStats() for cam in jobs}
    errors: List[Exception] = []
    meta: Dict[str, dict] = {}

    def decode_worker(cam: str, path: str):
        try:
            with VideoDecoder(path) as dec:
                meta[cam] = {"fps": dec.fps or 30.0}
                for frame in dec:
                    frame_q.put((cam, frame))
        except Exception as e:  # noqa: BLE001
            errors.append(e)
        finally:
            frame_q.put((cam, _DONE))

    def encode_worker(cam: str, out_path: str):
        try:
            enc = None
            while True:
                item = enc_qs[cam].get()
                if item is _DONE:
                    break
                if enc is None:
                    h, w = item.shape[:2]
                    ext = out_path.lower().rsplit(".", 1)[-1]
                    c = codec or {
                        "h265": "libx265", "hevc": "libx265",
                        "265": "libx265", "avi": "mjpeg",
                    }.get(ext, "mpeg4")
                    kwargs = dict(HEVC_DEFAULTS) if c == "libx265" else {}
                    kwargs["codec"] = c
                    enc = VideoEncoder(
                        out_path, w, h, fps=fps or meta[cam]["fps"], **kwargs
                    )
                enc.write(item)
            if enc is not None:
                enc.close()
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    dec_threads = [
        threading.Thread(target=decode_worker, args=(cam, src), daemon=True)
        for cam, (src, _) in jobs.items()
    ]
    enc_threads = [
        threading.Thread(target=encode_worker, args=(cam, dst), daemon=True)
        for cam, (_, dst) in jobs.items()
    ]
    for t in dec_threads + enc_threads:
        t.start()

    # Co-batcher: group frames by shape, flush on batch_size or drain.
    groups: Dict[Tuple[int, int], List[Tuple[str, np.ndarray]]] = {}
    live = set(jobs)

    def flush(shape_hw):
        items = groups.pop(shape_hw, [])
        if not items:
            return
        batch = np.stack([f for _, f in items])
        res = engine.process_batch(batch)
        for (cam, _), blurred in zip(items, res.frames):
            enc_qs[cam].put(blurred)
            stats[cam].frames += 1
        # Face/plate counts are per-batch; attribute by per-image boxes.
        for (cam, _), fb, pb in zip(items, res.face_boxes, res.plate_boxes):
            stats[cam].faces += len(fb)
            stats[cam].plates += len(pb)

    while live:
        cam, item = frame_q.get()
        if item is _DONE:
            live.discard(cam)
            if not live:
                for shape_hw in list(groups):
                    flush(shape_hw)
            continue
        key = item.shape[:2]
        groups.setdefault(key, []).append((cam, item))
        if len(groups[key]) >= batch_size:
            flush(key)

    for q_ in enc_qs.values():
        q_.put(_DONE)
    for t in enc_threads:
        t.join()
    for t in dec_threads:
        t.join()
    if errors:
        raise errors[0]
    log.info(
        "multicam done: %s",
        {c: (s.frames, s.faces, s.plates) for c, s in stats.items()},
    )
    return stats
