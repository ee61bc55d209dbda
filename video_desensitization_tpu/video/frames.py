"""Frame extraction and video assembly — reference L2 parity.

``convert_video_to_frames`` / ``create_video`` mirror the reference API
(combine_detect.py:279, :479 and video2picture.py/picture2video.py) but run
in-process through the native libav layer (no ffmpeg subprocess, no WSL2 tmp
copies) with a cv2 fallback. ``iter_frames`` is the streaming interface the
TPU pipeline actually uses: batched RGB arrays straight from the decoder, no
intermediate JPEG round-trip on disk.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np

from video_desensitization_tpu.utils.logging import get_logger
from video_desensitization_tpu.video.av import (
    VideoDecoder,
    VideoEncoder,
    default_codec_for,
)


def iter_frames(
    video_path: str, batch_size: int = 16, interval: int = 1
) -> Iterator[np.ndarray]:
    """Yield (b, H, W, 3) uint8 RGB batches (b <= batch_size)."""
    with VideoDecoder(video_path) as dec:
        batch = []
        for i, frame in enumerate(dec):
            if i % interval != 0:
                continue
            batch.append(frame)
            if len(batch) == batch_size:
                yield np.stack(batch)
                batch = []
        if batch:
            yield np.stack(batch)


def convert_video_to_frames(
    video_path: str, output_dir: str, interval: int = 1
) -> int:
    """Extract frames to ``frame_%06d.jpg`` files; returns the frame count
    (reference combine_detect.py:279-476 contract)."""
    import cv2

    log = get_logger("extract")
    os.makedirs(output_dir, exist_ok=True)
    count = 0
    with VideoDecoder(video_path) as dec:
        for i, frame in enumerate(dec):
            if i % interval != 0:
                continue
            count += 1
            out = os.path.join(output_dir, f"frame_{count:06d}.jpg")
            cv2.imwrite(out, cv2.cvtColor(frame, cv2.COLOR_RGB2BGR),
                        [cv2.IMWRITE_JPEG_QUALITY, 95])
    log.info("extracted %d frames from %s", count, video_path)
    return count


def create_video(
    frame_dir: str,
    output_path: str,
    fps: float = 60,
    codec: Optional[str] = None,
) -> bool:
    """Assemble sorted ``*.jpg`` frames into a video
    (reference combine_detect.py:479-595 contract). Codec defaults by
    extension: .h265/.hevc/.265 -> libx265, .mp4/.mov -> libx264 native
    (mp4v via cv2 fallback), .avi -> mjpeg."""
    import cv2

    log = get_logger("assemble")
    frames = sorted(
        f for f in os.listdir(frame_dir) if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    if not frames:
        log.error("no frames in %s", frame_dir)
        return False
    first = cv2.imread(os.path.join(frame_dir, frames[0]))
    if first is None:
        log.error("unreadable first frame")
        return False
    h, w = first.shape[:2]
    if codec is None:
        codec = default_codec_for(output_path)
    try:
        enc = VideoEncoder(output_path, w, h, fps=fps, codec=codec)
    except IOError:
        enc = VideoEncoder(output_path, w, h, fps=fps, codec="mpeg4")
    with enc:
        for name in frames:
            img = cv2.imread(os.path.join(frame_dir, name))
            if img is None:
                continue
            if img.shape[:2] != (h, w):
                img = cv2.resize(img, (w, h))
            enc.write(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    log.info("wrote %s (%d frames @ %.1f fps)", output_path, len(frames), fps)
    return True


def video_info(video_path: str) -> Tuple[int, int, float, Optional[int]]:
    with VideoDecoder(video_path) as dec:
        return dec.width, dec.height, dec.fps, dec.nframes


def batch_convert_videos(
    input_dir: str,
    output_parent_dir: str,
    video_format: str = "h265,hevc,265,mp4,mov,avi",
    interval: int = 1,
) -> Tuple[int, int]:
    """Extract frames for every matching video under ``input_dir`` into
    ``<output_parent_dir>/<video_stem>/`` (reference video2picture.py:82-142
    contract). Returns (videos_converted, total_frames)."""
    log = get_logger("extract")
    exts = {e.strip().lower().lstrip(".") for e in video_format.split(",") if e.strip()}
    videos = 0
    frames = 0
    for root, _dirs, files in os.walk(input_dir):
        for name in sorted(files):
            if name.rsplit(".", 1)[-1].lower() not in exts:
                continue
            src = os.path.join(root, name)
            # Output keyed by path RELATIVE to input_dir: same-named videos
            # in different subdirs must not overwrite each other's frames.
            rel = os.path.relpath(src, input_dir)
            dst = os.path.join(output_parent_dir, os.path.splitext(rel)[0])
            try:
                n = convert_video_to_frames(src, dst, interval=interval)
            except Exception as e:  # noqa: BLE001
                log.error("failed to convert %s: %s", src, e)
                continue
            videos += 1
            frames += n
    log.info("converted %d videos (%d frames) under %s", videos, frames, input_dir)
    return videos, frames


def check_available_codecs(codecs: Tuple[str, ...] = ("libx265", "libx264", "mpeg4", "mjpeg")):
    """Probe encoders by test-opening writers (reference
    combine_detect.py:53-89 / video2picture.py check_h265_support).
    Returns {codec: bool}."""
    import tempfile

    log = get_logger("codecs")
    out = {}
    with tempfile.TemporaryDirectory() as d:
        for codec in codecs:
            ext = ".avi" if codec == "mjpeg" else ".mp4"
            path = os.path.join(d, f"probe_{codec}{ext}")
            try:
                with VideoEncoder(path, 64, 64, fps=10, codec=codec) as e:
                    e.write(np.zeros((64, 64, 3), np.uint8))
                out[codec] = True
            except Exception:  # noqa: BLE001
                out[codec] = False
    log.info("available codecs: %s", out)
    return out


def check_h265_support() -> bool:
    """True when HEVC encode is available (reference video2picture.py:5-31)."""
    return check_available_codecs(("libx265",)).get("libx265", False)
