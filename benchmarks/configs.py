"""The five BASELINE.json benchmark configs as runnable harnesses.

    python benchmarks/configs.py            # run all
    python benchmarks/configs.py 3 5        # run selected

Each config prints one JSON line {"config": N, "name": ..., "fps": ...,
"frames": ...}. Inputs are synthesized (noise JPEGs, HEVC/MP4 via the native
encoder, cyber records via record.writer) so no external data or weights are
required; detectors run with random weights, which over-detects relative to
real checkpoints — the numbers are conservative.

Configs (BASELINE.md):
  1. single-frame RetinaFace face detect + mosaic (one 1080p JPEG)
  2. batched face blur over extracted frames (video2picture -> detect ->
     picture2video)
  3. combined face + YOLO plate detection with per-class mosaic
  4. streaming MP4 with overlapped decode/encode + device inference
  5. multi-camera .record desensitization with large frame batches
"""

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vdt_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


_CACHE = {}


def _engines(input_size=640, batch=16):
    # One shared detector/pipeline set per process: every config reuses the
    # same compiled programs and HBM-resident params.
    if input_size in _CACHE:
        return _CACHE[input_size]
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    from video_desensitization_tpu.detect.face import Retinaface
    from video_desensitization_tpu.detect.plate import PlateDetector
    from video_desensitization_tpu.pipeline.throughput import TieredPipeline

    face = Retinaface(
        model_path=None,
        backbone="resnet50",
        input_shape=[input_size, input_size, 3],
        confidence=0.5,
        nms_iou=0.4,
        max_detections=64,
        dtype=jnp.bfloat16,
    )
    plate = PlateDetector(
        model_path=None,
        variant="n",
        confidence=0.5,
        input_shape=(input_size, input_size),
        max_detections=32,
        dtype=jnp.bfloat16,
    )
    _CACHE[input_size] = (TieredPipeline(face, plate, mosaic_level=8), face, plate)
    return _CACHE[input_size]


def _noise_frames(n, h=1080, w=1920, seed=0):
    return np.random.default_rng(seed).integers(0, 255, (n, h, w, 3), dtype=np.uint8)


def _solo_pipe():
    from video_desensitization_tpu.pipeline.throughput import TieredPipeline

    if "solo" not in _CACHE:
        _, face, _ = _engines()
        _CACHE["solo"] = TieredPipeline(face, None, mosaic_level=8)
    return _CACHE["solo"]


def config1():
    """Single 1080p frame: face detect + mosaic latency."""
    solo = _solo_pipe()
    frame = _noise_frames(1)
    solo.process_batch(frame)  # compile
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        solo.process_batch(frame)
    dt = time.perf_counter() - t0
    return {"config": 1, "name": "single_frame_face_mosaic", "fps": iters / dt,
            "frames": iters}


def config2():
    """video2picture -> batched face blur -> picture2video (disk round trip)."""
    import cv2

    from video_desensitization_tpu.video.frames import (
        convert_video_to_frames,
        create_video,
    )
    from video_desensitization_tpu.video.av import VideoEncoder, native_available

    if not native_available():
        return {"config": 2, "skipped": "native av layer unavailable"}
    solo = _solo_pipe()
    n = 48
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src.mp4")
        with VideoEncoder(src, 1920, 1080, fps=30, codec="libx264") as e:
            for f in _noise_frames(n):
                e.write(f)
        frames_dir = os.path.join(d, "frames")
        out_dir = os.path.join(d, "processed")
        os.makedirs(out_dir)
        # compile outside the timed region
        solo.process_batch(_noise_frames(16, seed=1))
        t0 = time.perf_counter()
        count = convert_video_to_frames(src, frames_dir)
        names = sorted(os.listdir(frames_dir))
        for i in range(0, len(names), 16):
            chunk = names[i : i + 16]
            batch = np.stack([
                cv2.cvtColor(cv2.imread(os.path.join(frames_dir, f)), cv2.COLOR_BGR2RGB)
                for f in chunk
            ])
            res = solo.process_batch(batch)
            for name, img in zip(chunk, res.frames):
                cv2.imwrite(os.path.join(out_dir, name),
                            cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        create_video(out_dir, os.path.join(d, "out.mp4"), fps=30)
        dt = time.perf_counter() - t0
    return {"config": 2, "name": "extract_detect_assemble", "fps": count / dt,
            "frames": count}


def config3():
    """Combined face + plate detection with mosaic, batched 1080p."""
    pipe, _, _ = _engines()
    frames = _noise_frames(16)
    pipe.process_batch(frames)
    t0 = time.perf_counter()
    n = 0
    for res in pipe.process_stream((frames for _ in range(6)), depth=2):
        n += res.frames.shape[0]
    dt = time.perf_counter() - t0
    return {"config": 3, "name": "face_plate_mosaic_batched", "fps": n / dt,
            "frames": n}


def config4():
    """Streaming MP4: overlapped decode | device | encode."""
    from video_desensitization_tpu.pipeline.streaming import process_video_stream
    from video_desensitization_tpu.video.av import VideoEncoder, native_available

    if not native_available():
        return {"config": 4, "skipped": "native av layer unavailable"}
    pipe, _, _ = _engines()
    n = 96
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src.mp4")
        with VideoEncoder(src, 1920, 1080, fps=30, codec="libx264") as e:
            for f in _noise_frames(n):
                e.write(f)
        pipe.process_batch(_noise_frames(16, seed=1))  # compile
        stats = process_video_stream(
            src, os.path.join(d, "out.mp4"), pipe, batch_size=16
        )
    return {"config": 4, "name": "streaming_mp4", "fps": stats.fps,
            "frames": stats.frames}


def config5():
    """Multi-camera .record job: unpack -> desensitize -> repack."""
    from video_desensitization_tpu.api.config import PipelineConfig
    from video_desensitization_tpu.pipeline.video_pipeline import process_record_job
    from video_desensitization_tpu.record.proto import sensor_image_pb2 as sp
    from video_desensitization_tpu.record.topics import (
        CAMERA_TOPICS,
        COMPRESSED_IMAGE_TYPE,
    )
    from video_desensitization_tpu.record.writer import RecordWriter
    from video_desensitization_tpu.video.av import (
        PacketDemuxer,
        VideoEncoder,
        native_available,
    )

    if not native_available():
        return {"config": 5, "skipped": "native av layer unavailable"}
    pipe, _, _ = _engines()
    n, n_topics = 30, 4
    with tempfile.TemporaryDirectory() as d:
        src_stream = os.path.join(d, "src.h265")
        with VideoEncoder(src_stream, 1280, 720, fps=30, codec="libx265",
                          bitrate=2_000_000, preset="ultrafast") as e:
            for f in _noise_frames(n, 720, 1280):
                e.write(f)
        with PacketDemuxer(src_stream) as dm:
            packets = dm.read_packets()
        rec = os.path.join(d, "job.record")
        with RecordWriter(rec) as w:
            for t in CAMERA_TOPICS[:n_topics]:
                w.write_channel(t, COMPRESSED_IMAGE_TYPE)
            for i, p in enumerate(packets):
                for t in CAMERA_TOPICS[:n_topics]:
                    img = sp.CompressedImage(
                        format="h265", data=p.data, measurement_time=i / 30
                    )
                    img.header.sequence_num = i
                    w.write_message(t, img, 1_000_000_000 + i * 33_000_000)

        cfg = PipelineConfig(
            record_dir=rec,
            output_h265_dir=os.path.join(d, "h265"),
            output_videos_dir=os.path.join(d, "videos"),
            temp_directory_base=os.path.join(d, "tmp"),
            record_output_dir=os.path.join(d, "out"),
            batch_size=16,
            output_fps=30.0,
        )
        pipe.process_batch(_noise_frames(16, 720, 1280, seed=1))  # compile
        t0 = time.perf_counter()
        stats = process_record_job(cfg, pipe)
        dt = time.perf_counter() - t0
    return {"config": 5, "name": "record_multicam", "fps": stats.frames / dt,
            "frames": stats.frames, "videos": stats.videos_processed}


def config6():
    """Multi-camera .record job with co-batching (frames from all cameras
    share device batches — pipeline/multicam.py)."""
    from video_desensitization_tpu.api.config import PipelineConfig
    from video_desensitization_tpu.pipeline.video_pipeline import process_record_job
    from video_desensitization_tpu.record.proto import sensor_image_pb2 as sp
    from video_desensitization_tpu.record.topics import (
        CAMERA_TOPICS,
        COMPRESSED_IMAGE_TYPE,
    )
    from video_desensitization_tpu.record.writer import RecordWriter
    from video_desensitization_tpu.video.av import (
        PacketDemuxer,
        VideoEncoder,
        native_available,
    )

    if not native_available():
        return {"config": 6, "skipped": "native av layer unavailable"}
    pipe, _, _ = _engines()
    n, n_topics = 30, 4
    with tempfile.TemporaryDirectory() as d:
        src_stream = os.path.join(d, "src.h265")
        with VideoEncoder(src_stream, 1280, 720, fps=30, codec="libx265",
                          bitrate=2_000_000, preset="ultrafast") as e:
            for f in _noise_frames(n, 720, 1280):
                e.write(f)
        with PacketDemuxer(src_stream) as dm:
            packets = dm.read_packets()
        rec = os.path.join(d, "job.record")
        with RecordWriter(rec) as w:
            for t in CAMERA_TOPICS[:n_topics]:
                w.write_channel(t, COMPRESSED_IMAGE_TYPE)
            for i, p in enumerate(packets):
                for t in CAMERA_TOPICS[:n_topics]:
                    img = sp.CompressedImage(
                        format="h265", data=p.data, measurement_time=i / 30
                    )
                    img.header.sequence_num = i
                    w.write_message(t, img, 1_000_000_000 + i * 33_000_000)

        cfg = PipelineConfig(
            record_dir=rec,
            output_h265_dir=os.path.join(d, "h265"),
            output_videos_dir=os.path.join(d, "videos"),
            temp_directory_base=os.path.join(d, "tmp"),
            record_output_dir=os.path.join(d, "out"),
            batch_size=16,
            output_fps=30.0,
            co_batch=True,
        )
        pipe.process_batch(_noise_frames(16, 720, 1280, seed=1))  # compile
        t0 = time.perf_counter()
        stats = process_record_job(cfg, pipe)
        dt = time.perf_counter() - t0
    return {"config": 6, "name": "record_multicam_cobatched", "fps": stats.frames / dt,
            "frames": stats.frames, "videos": stats.videos_processed}


CONFIGS = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5,
           6: config6}


def main(argv):
    chosen = [int(a) for a in argv] or sorted(CONFIGS)
    for c in chosen:
        print(json.dumps(CONFIGS[c]()), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
