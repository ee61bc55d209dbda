"""CLI entrypoint — the ``combine_detect.py`` equivalent.

Usage (parity with the reference's config-driven, no-arg invocation):

    python -m video_desensitization_tpu.cli.main [config.ini]
    python -m video_desensitization_tpu.cli.main --video in.mp4 --out out.mp4
    python -m video_desensitization_tpu.cli.main --images dir/ --out outdir/

Runs the full record job (unpack -> detect+mosaic on TPU -> repack) when a
record config is given, or single-video / image-directory modes for ad-hoc
use.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp


def _resolve_checkpoint(path, allow_random: bool, what: str):
    """Return a checkpoint path, or None for explicitly-sanctioned random init.

    A desensitization run with randomly-initialized detectors blurs nothing
    while reporting success — a silent privacy failure. Empty model paths in
    the config are therefore an error in the CLI path; random init requires
    an explicit opt-in (path set to the literal ``random``, or
    ``--allow-random-weights``). Library/bench construction with
    ``model_path=None`` is unaffected.
    """
    from video_desensitization_tpu.utils.logging import get_logger

    stripped = (path or "").strip()
    if stripped and stripped.lower() != "random":
        return stripped
    if not allow_random and stripped.lower() != "random":
        raise ValueError(
            f"no {what} checkpoint configured (empty model path). Refusing to "
            "run the desensitization job with RANDOM weights — the output "
            "would not be blurred. Set the checkpoint path in config.ini, or "
            "opt in explicitly with the literal path 'random' or "
            "--allow-random-weights."
        )
    get_logger("cli").warning(
        "%s detector initialized with RANDOM weights (explicit opt-in) — "
        "output will NOT be meaningfully desensitized",
        what,
    )
    return None


def probe_link_gib_s(size_mb: int = 32, reps: int = 2) -> float:
    """Measure host->device bandwidth (GiB/s, i.e. gigaBYTES — not gigabits)
    with a short device_put burst."""
    import numpy as np

    buf = np.zeros((size_mb << 20,), np.uint8)
    x = jax.device_put(buf)
    np.asarray(x[:1])  # warm + sync (block_until_ready unreliable on axon)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        x = jax.device_put(buf)
        np.asarray(x[:1])
        best = max(best, size_mb / 1024.0 / (time.perf_counter() - t0))
    return best


# Backwards-compatible alias (the old name was ambiguous about bits vs bytes).
probe_link_gbps = probe_link_gib_s

# engine=auto threshold, GiB/s — derived from MEASURED chip-side rates
# (bench.py fused_device_fps, r3). The fused program sustains 530 fps
# pipelined at batch 128 with frames device-resident — a worst-case bound
# (random-weight giant boxes); at a calibrated typical box load it
# measures 586 fps (fused_device_fps_typical). The tiered path's
# host-stage ceiling is ~300 fps/batch-32 on a modest host
# (stage_breakdown.py: letterbox 56 ms + mosaic 50 ms per batch). Fused
# must move raw 1080p frames BOTH ways (~12.4 MB/frame), so beating tiered
# needs >3.7 GB/s of AGGREGATE link throughput. The probe measures h2d
# alone and cannot tell full- from half-duplex: on a half-duplex link a
# 4 GiB/s probe means only ~4.3 GB/s aggregate -> ~170 fps fused, a LOSS.
# At 6 GiB/s even the half-duplex case sustains >= 520 fps of frame
# traffic, at the 530 fps worst-case chip bound — fused cannot lose there.
AUTO_ENGINE_FUSED_GIB_S = 6.0
# yuv420 transport moves planar I420 both ways (~6.2 MB/frame total at
# 1080p, half of RGB) and the yuv fused program measures 474 fps at the
# same worst-case load (bench.py fused_device_fps_yuv): the half-duplex
# link rate that carries 474 fps of I420 traffic is ~2.9 GiB/s.
AUTO_ENGINE_FUSED_YUV_GIB_S = 3.0


def pick_engine(gib_s: float, transfer: str = "rgb") -> str:
    """Resolve engine=auto from a measured link bandwidth (shared by
    build_engine and cli.doctor so the recommendation can't diverge).
    transfer: the configured frame transport — yuv420 halves fused's link
    traffic, halving the bandwidth at which fused cannot lose."""
    floor = (
        AUTO_ENGINE_FUSED_YUV_GIB_S
        if transfer == "yuv420"
        else AUTO_ENGINE_FUSED_GIB_S
    )
    return "fused" if gib_s >= floor else "tiered"


def build_engine(cfg, with_plates: bool = True, allow_random: bool = False):
    from video_desensitization_tpu.detect.face import Retinaface
    from video_desensitization_tpu.detect.plate import PlateDetector
    from video_desensitization_tpu.parallel.mesh import make_mesh
    from video_desensitization_tpu.pipeline.engine import DesensitizationEngine
    from video_desensitization_tpu.pipeline.throughput import TieredPipeline
    from video_desensitization_tpu.utils.logging import get_logger

    engine_mode = cfg.engine
    if engine_mode == "auto":
        gib_s = probe_link_gib_s()
        engine_mode = pick_engine(gib_s, getattr(cfg, "transfer", "rgb"))
        get_logger("cli").info(
            "engine=auto: link probe %.2f GiB/s -> %s (transfer=%s)",
            gib_s, engine_mode, getattr(cfg, "transfer", "rgb"),
        )

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]
    mesh = None
    n_dev = len(jax.devices())
    if cfg.mesh_data == 0 and n_dev > 1:
        mesh = make_mesh()
    elif cfg.mesh_data > 1:
        mesh = make_mesh(data=cfg.mesh_data)

    face = Retinaface(
        model_path=_resolve_checkpoint(cfg.model_path, allow_random, "face"),
        backbone="resnet50",
        confidence=cfg.confidence,
        nms_iou=cfg.nms_iou,
        input_shape=[cfg.input_size, cfg.input_size, 3],
        max_detections=cfg.max_detections,
        dtype=dtype,
    )
    plate = None
    if with_plates:
        plate = PlateDetector(
            model_path=_resolve_checkpoint(
                cfg.model_weights, allow_random, "plate"
            ),
            confidence=cfg.plate_confidence,
            input_shape=(cfg.input_size, cfg.input_size),
            dtype=dtype,
        )
    if engine_mode == "tiered":
        if mesh is not None:
            get_logger("cli").warning(
                "engine=tiered runs single-chip; mesh_data=%s is ignored "
                "(use engine=fused for multi-chip batch sharding)",
                cfg.mesh_data,
            )
        engine = TieredPipeline(
            face,
            plate,
            mosaic_level=cfg.mosaic_level,
            transfer=cfg.transfer,
            anonymizer=cfg.anonymizer,
        )
    else:
        engine = DesensitizationEngine(
            face,
            plate,
            mosaic_level=cfg.mosaic_level,
            mesh=mesh,
            anonymizer=cfg.anonymizer,
        )
    interval = getattr(cfg, "detect_interval", 1)
    if interval > 1:
        from video_desensitization_tpu.pipeline.tracking import TrackingEngine

        # Auto detect_batch reuses the engine's compiled batch size so the
        # tracker drives the SAME XLA program as the non-tracked path; an
        # explicit [TPU] track_detect_batch trades first-result latency and
        # frame-buffer RAM against pipelining (api/config.py numbers).
        detect_batch = getattr(cfg, "track_detect_batch", 0) or cfg.batch_size
        get_logger("cli").info(
            "detect_interval=%d: keyframe detection (batches of %d) + "
            "host-propagated coverage on ordered streams "
            "(pipeline/tracking.py)", interval, detect_batch,
        )
        engine = TrackingEngine(
            engine,
            interval=interval,
            detect_batch=detect_batch,
            coast=getattr(cfg, "track_coast", 3),
        )
    return engine


def main(argv=None) -> int:
    from video_desensitization_tpu.api.config import PipelineConfig, load_config
    from video_desensitization_tpu.utils.logging import setup_logger

    p = argparse.ArgumentParser(description="TPU video desensitization")
    p.add_argument("config", nargs="?", default="config.ini")
    p.add_argument("--video", help="process a single video file")
    p.add_argument("--images", help="process a directory of images")
    p.add_argument("--out", help="output path (video) or directory (images)")
    p.add_argument("--no-plates", action="store_true")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument(
        "--allow-random-weights",
        action="store_true",
        help="explicitly allow running with randomly-initialized detectors "
        "(testing only; output will NOT be desensitized)",
    )
    p.add_argument(
        "--profile",
        metavar="DIR",
        help="capture a jax.profiler trace of the whole job into DIR "
        "(view with TensorBoard/xprof)",
    )
    args = p.parse_args(argv)

    log = setup_logger()
    log.info("jax %s | devices: %s", jax.__version__, jax.devices())

    try:
        cfg = load_config(args.config, strict=args.video is None and args.images is None)
    except (FileNotFoundError, ValueError):
        if args.video is None and args.images is None:
            raise
        cfg = PipelineConfig()
    if args.batch_size:
        cfg.batch_size = args.batch_size

    t0 = time.time()
    engine = build_engine(
        cfg,
        with_plates=not args.no_plates,
        allow_random=args.allow_random_weights,
    )

    import contextlib

    trace = contextlib.nullcontext()
    if args.profile:
        from video_desensitization_tpu.utils.timers import profile_trace

        trace = profile_trace(args.profile)

    with trace:
        _run_job(args, cfg, engine, log)
    log.info("total wall time: %.1fs", time.time() - t0)
    return 0


def _run_job(args, cfg, engine, log) -> None:
    if args.video:
        from video_desensitization_tpu.pipeline.streaming import process_video_stream

        out = args.out or args.video.rsplit(".", 1)[0] + "_processed.mp4"
        stats = process_video_stream(
            args.video, out, engine, batch_size=cfg.batch_size,
            encode_kwargs=getattr(cfg, "encode_kwargs", None),
            transport=cfg.transfer,
        )
        log.info(
            "done: %d frames, %d faces, %d plates, %.1f fps end-to-end",
            stats.frames, stats.faces, stats.plates, stats.fps,
        )
    elif args.images:
        from video_desensitization_tpu.pipeline.batch import batch_process_images

        out = args.out or args.images.rstrip("/") + "_processed"
        n, faces, plates = batch_process_images(
            args.images, out, engine, batch_size=cfg.batch_size
        )
        log.info("done: %d images, %d faces, %d plates", n, faces, plates)
    else:
        from video_desensitization_tpu.pipeline.video_pipeline import process_record_job

        stats = process_record_job(cfg, engine)
        log.info("final record: %s", stats.record_path)


if __name__ == "__main__":
    sys.exit(main())
