"""Headline benchmark: end-to-end 1080p desensitization frames/sec on one chip.

Measures the full per-frame work of the reference's hot loop
(combine_detect.py:183-277) — letterbox, RetinaFace-ResNet50 face forward,
YOLOv8 plate forward, box decode, padded NMS, inverse letterbox, and the
reference-exact mosaic — through the link-aware tiered pipeline
(video_desensitization_tpu/pipeline/throughput.py): host cv2 letterbox,
ONE fused bf16 device program for both detectors, boxes-only readback,
host mosaic, with double-buffered batches so transfer overlaps compute.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N,
     "best_fps": N, "windows": [...], "tracked_fps_i4": N,
     "tracked_fps_i4_typical": N, "e2e_fps_typical": N,
     "device_fps": N, "device_batch": N,
     "device_fps_sync_b<B>": N, "flops_per_frame": N, "mfu": N,
     "fused_fps": N, "fused_device_fps": N, "fused_device_fps_b<B>": N,
     "fused_device_fps_nobox": N, "fused_device_fps_typical": N,
     "fused_device_fps_yuv": N,
     "typical_load": [3, 1], "link_h2d_mbps": N}

(`benchmarks/stage_breakdown.py` decomposes one e2e cycle per stage.)

tracked_fps_i4 is the same e2e stream under detection-interval tracking
([TPU] detect_interval = 4, pipeline/tracking.py): full detection on every
4th frame, gap frames covered by interpolated keyframe boxes mosaicked on
the host without touching the device. The headline `value` keeps the
reference per-frame-detection protocol. The tracked protocol matches the
headline's (same window count, no in-clock copies) and streams interval x
as many frames per window so the keyframe pipeline reaches steady state
(the round-4 protocol starved it to ~2.5 dispatches/window). Whether the
knob WINS on a given host depends on box geometry, host cores, AND link
weather (r5 hardware: +25% typical at 94.3 MB/s h2d, +30% at 65.9;
parity-within-noise at a starved 22.4 MB/s —
benchmarks/bench_r5_session.json / bench_r5_replicate.json /
bench_r5_badweather.json):
tracked_fps_i4 is the worst-case bound (random-init ~24 quarter-frame
boxes host-blurred per gap frame — pure host-mosaic saturation on a
1-core host), tracked_fps_i4_typical the production-realistic one (a
deterministic synthetic detector: 3 face-sized + 1 plate-sized drifting
boxes, full device detection still timed). Compare it against
e2e_fps_typical — per-frame detection at the SAME synthetic load — for
the apples-to-apples crossover; README quotes the measured pair.

value is the MEDIAN of N e2e windows — the honest steady-state headline
(stage_breakdown attributes window spread entirely to h2d link weather);
the best window and all windows are reported alongside (best_fps,
windows). device_fps times the fused two-detector program alone with
device-resident inputs and boxes-only readback — evidence of chip-side
speed independent of the single host core. It is measured pipelined
(dispatches queued, one sync) at BENCH_DEVICE_BATCH (default 128): a
synchronous per-batch loop mostly measures the tunnel's ~77 ms round trip
(reported too, as device_fps_sync_b<batch>).
mfu = device_fps * XLA-costed flops/frame / peak bf16 flops (v5e 197 TF/s,
override with BENCH_PEAK_FLOPS). fused_fps is the fully-fused engine
(detect + Pallas mosaic in ONE program, raw frames both ways) — the
deployment shape for bandwidth-rich hosts — measured e2e on THIS host's
link; fused_device_fps measures the same program pipelined with
device-resident frames (what a PCIe-class host would see chip-side, the
number engine=auto's threshold extrapolates from). Random-init weights
make that a WORST-CASE mosaic load; fused_device_fps_nobox reruns it with
confidence above any score (NMS keeps nothing) to pin the opposite,
detect-bound end. fused_device_fps_typical MEASURES the realistic
mid-load point with STRUCTURAL top-k caps (max_detections = 3 faces +
1 plate — typical_load reports the caps): exactly that many boxes
survive NMS per frame regardless of the random-init score distribution
(box sizes remain random-init-large, so this still overstates real
footage's cost; the kernel's typical-load cost is ~44 us/frame,
benchmarks/mosaic_bench.py). tracked_fps_i4_typical and e2e_fps_typical
instead fix both count AND size: a deterministic synthetic detector
(_RealisticBoxPipeline) replaces the unpacked device boxes with 3
face-sized + 1 plate-sized drifting boxes while the full device program
still runs and is timed — host blur and tracker cost at production
geometry, chip cost unchanged.

vs_baseline divides by the reference-structure CPU-path measurement cached in
benchmarks/cpu_baseline.json (re-derive with benchmarks/cpu_baseline.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vdt_jax_cache")

import numpy as np


def main() -> None:
    import jax

    # BENCH_SMOKE=1: tiny shapes on the CPU backend — validates every code
    # path of this script (incl. the top-k-capped typical-load blocks) in ~2
    # minutes without a TPU. The printed numbers are meaningless; the run
    # exercises the full contract the driver depends on.
    smoke = os.environ.get("BENCH_SMOKE", "0") == "1"
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from video_desensitization_tpu.detect.face import Retinaface
    from video_desensitization_tpu.detect.plate import PlateDetector
    from video_desensitization_tpu.pipeline.throughput import TieredPipeline

    class _RealisticBoxPipeline(TieredPipeline):
        """Full device-detection cost, deterministic production-size boxes.

        Overrides ``_unpack`` with the shared synthetic detector
        (benchmarks/synthetic_boxes.py): 3 face-sized + 1 plate-sized
        drifting boxes replace the random-init device detections. The
        device program is untouched — dispatch, compute and readback all
        stay in the timed path — so host mosaic / tracker cost is
        measured at realistic geometry without faking any chip work.
        """

        def __init__(self, frame_hw, *args, **kwargs):
            super().__init__(*args, **kwargs)
            from benchmarks.synthetic_boxes import override_unpack

            override_unpack(self, frame_hw)

    batch = int(os.environ.get("BENCH_BATCH", "2" if smoke else "32"))
    n_batches = int(os.environ.get("BENCH_BATCHES", "2" if smoke else "10"))
    frame_hw = (96, 160) if smoke else (1080, 1920)
    backbone = "mobilenet" if smoke else "resnet50"
    input_size = 128 if smoke else 640
    model_dtype = jnp.float32 if smoke else jnp.bfloat16

    # max_detections caps the per-frame mosaic work. Random-init weights
    # pass ~50% of anchors at conf 0.5 (real checkpoints produce 1-5 boxes
    # per frame), so an uncapped run measures an unrealistic mosaic load;
    # 16 faces + 8 plates per frame is still generous vs. real footage.
    # ONE constructor for the fused bounds (worst/nobox/typical) so they
    # can never drift apart in anything but threshold and top-k cap. The
    # "typical" load is STRUCTURAL: max_detections=3 faces + 1 plate caps
    # NMS itself, so exactly that many boxes survive per frame regardless
    # of the random-init score distribution (the round-3 score-rank
    # calibration saturated at 1.0 and selected an arbitrary subset).
    def make_detectors(face_conf, plate_conf, face_k=16, plate_k=8):
        f = Retinaface(
            model_path=None,
            backbone=backbone,
            input_shape=[input_size, input_size, 3],
            confidence=face_conf,
            nms_iou=0.4,
            max_detections=face_k,
            dtype=model_dtype,
        )
        p = PlateDetector(
            model_path=None,
            variant="n",
            confidence=plate_conf,
            input_shape=(input_size, input_size),
            max_detections=plate_k,
            dtype=model_dtype,
        )
        return f, p

    face, plate = make_detectors(0.5, 0.5)
    # transfer=yuv420 halves link bytes for one host cv2 conversion. On the
    # h2d-bound tunnel (44 MB/s measured) it wins decisively: same-session
    # A/B at batch 32 measured 34.5 fps (yuv420) vs 20.7 fps (rgb). The
    # sources are H.265 4:2:0, so chroma re-subsampling loses nothing the
    # codec stored.
    pipe = TieredPipeline(
        face,
        plate,
        mosaic_level=8,
        transfer=os.environ.get("BENCH_TRANSFER", "yuv420"),
    )

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (batch, *frame_hw, 3), dtype=np.uint8)
    frame_shape_row = np.array([[float(frame_hw[0]), float(frame_hw[1])]], np.float32)

    # Warmup: compile + two steady-state iterations.
    pipe.process_batch(frames)
    pipe.process_batch(frames)

    # N windows: the host<->chip link throughput fluctuates run-to-run; the
    # MEDIAN is the headline (steady state), the best window is reported
    # alongside (the pipeline's capability under good link weather).
    windows = int(os.environ.get("BENCH_WINDOWS", "1" if smoke else "4"))
    # Depth default lives in pipeline.throughput.DEFAULT_STREAM_DEPTH with
    # the interleaved A/B measurements that chose it.
    from video_desensitization_tpu.pipeline.throughput import (
        DEFAULT_STREAM_DEPTH,
    )

    depth = int(os.environ.get("BENCH_DEPTH", str(DEFAULT_STREAM_DEPTH)))
    window_fps = []
    for _ in range(windows):
        t0 = time.perf_counter()
        n_frames = 0
        for res in pipe.process_stream(
            (frames for _ in range(n_batches)), depth=depth
        ):
            n_frames += res.frames.shape[0]
        dt = time.perf_counter() - t0
        window_fps.append(n_frames / dt)
    best_fps = max(window_fps)
    fps = float(np.median(window_fps))  # headline = median (honest steady state)

    # ---- tracked_fps_i4: the same e2e stream with detection-interval
    # tracking (pipeline/tracking.py) at interval=4 — detect every 4th
    # frame on the chip, cover the gap frames with IoU-matched interpolated
    # keyframe boxes mosaicked on the host. Gap frames never cross the
    # link, so on link-bound hosts e2e scales toward interval x of the
    # LINK rate; whether that shows up end-to-end depends on how much
    # host-blur work the boxes cost (see the _Realistic variants below).
    # Protocol parity with the headline (round-4 verdict items):
    #  - same window count, median reported;
    #  - no per-batch frames.copy() inside the clock. The headline loop
    #    reuses one frames array too; tracked gap frames are blurred in
    #    place, but re-blurring the same region next window costs exactly
    #    the same (mosaic cost is content-independent), and with
    #    batch % interval == 0 every stream position keeps its
    #    keyframe/gap role, so keyframe content never mutates and the
    #    detections feeding the tracker stay constant;
    #  - interval x as many frames per window, so each window holds
    #    n_batches full keyframe dispatches — the same device-dispatch
    #    count as a headline window — instead of the ~2.5 the round-4
    #    protocol starved the in-flight pipeline down to (flush-tail-
    #    dominated; steady state needs >= (depth+2)*interval*detect_batch
    #    frames).
    tracked_fps = None
    tracked_fps_typical = None
    e2e_fps_typical = None
    interval = int(os.environ.get("BENCH_TRACK_INTERVAL", "4"))
    if os.environ.get("BENCH_TRACKED", "1") == "1":
        from video_desensitization_tpu.pipeline.tracking import TrackingEngine

        def _tracked_median(base_pipe) -> float:
            t_windows = []
            for _ in range(windows):
                teng = TrackingEngine(
                    base_pipe, interval=interval, detect_batch=batch
                )
                t0 = time.perf_counter()
                n_frames = 0
                for res in teng.process_stream(
                    frames for _ in range(n_batches * interval)
                ):
                    n_frames += res.frames.shape[0]
                t_windows.append(n_frames / (time.perf_counter() - t0))
            return float(np.median(t_windows))

        tracked_fps = _tracked_median(pipe)
        # The number above host-blurs gap frames at the random-init
        # WORST-CASE load (~24 quarter-frame boxes per gap frame — on a
        # 1-core host that is pure mosaic saturation, not the knob's
        # production cost). The _typical pair measures production GEOMETRY:
        # _RealisticBoxPipeline runs the identical device program (same
        # detectors, full chip cost in the clock) but replaces the unpacked
        # detections with a deterministic synthetic detector's 3 face-sized
        # + 1 plate-sized drifting boxes — the round-4 top-k caps fixed box
        # COUNT but left random-init quarter-frame SIZES. e2e_fps_typical
        # is per-frame detection at the SAME load: the apples-to-apples
        # baseline tracked_fps_i4_typical must beat for the knob to pay.
        if os.environ.get("BENCH_TRACKED_TYPICAL", "1") == "1":
            pipe_rt = _RealisticBoxPipeline(
                frame_hw,
                face,
                plate,
                mosaic_level=8,
                transfer=pipe.transfer,
            )
            pipe_rt.process_batch(frames)  # warm (program cache-shared)
            tracked_fps_typical = _tracked_median(pipe_rt)
            t_windows = []
            for _ in range(windows):
                t0 = time.perf_counter()
                n_frames = 0
                for res in pipe_rt.process_stream(
                    (frames for _ in range(n_batches)), depth=depth
                ):
                    n_frames += res.frames.shape[0]
                t_windows.append(n_frames / (time.perf_counter() - t0))
            e2e_fps_typical = float(np.median(t_windows))

    # ---- device-program fps: the fused two-detector program alone, with
    # device-resident letterboxed input and boxes-only readback. This is the
    # chip-side rate the host pipeline feeds; it shows the chip is not the
    # bottleneck behind the single CPU core.
    #
    # Measured PIPELINED (all dispatches queued, one sync at the end) at
    # BENCH_DEVICE_BATCH: the sustained rate when the pipeline keeps the chip
    # fed, which is how the tiered pipeline actually drives it (depth>=2).
    # A per-batch synchronous loop instead measures the tunnel's ~77 ms
    # round-trip latency: batch-sweep deltas showed ~80 ms fixed + ~0.85 ms
    # per frame, i.e. sync-loop "device fps" is mostly link latency.
    # device_fps_sync reports that number too, at the e2e batch size.
    from video_desensitization_tpu.ops.image import letterbox_geometry

    plate_vars = plate.variables

    def _device_args(bsz):
        sub = frames[: min(bsz, batch)]
        reps = int(np.ceil(bsz / sub.shape[0]))
        fr = np.concatenate([sub] * reps)[:bsz]
        shapes_np = np.tile(frame_shape_row, (bsz, 1))
        geom_np = letterbox_geometry(shapes_np, pipe.input_hw)
        aux_np = np.concatenate(
            [shapes_np, np.asarray(geom_np, np.float32)], axis=1
        )
        return (
            jnp.asarray(pipe.letterbox_batch(fr)),
            jnp.asarray(aux_np),
        )

    lb_dev, aux_dev = _device_args(batch)

    def run_program():
        out = pipe._program(face.variables, plate_vars, lb_dev, aux_dev)
        # block_until_ready is unreliable on the axon platform: sync by
        # fetching one packed row.
        np.asarray(out[:1])

    run_program()  # warm (program already compiled by the e2e run)
    dev_iters = int(os.environ.get("BENCH_DEVICE_ITERS", "5"))
    t0 = time.perf_counter()
    for _ in range(dev_iters):
        run_program()
    device_fps_sync = dev_iters * batch / (time.perf_counter() - t0)

    dev_batch = int(os.environ.get("BENCH_DEVICE_BATCH", "2" if smoke else "128"))
    lb_p, aux_p = _device_args(dev_batch)
    out = pipe._program(face.variables, plate_vars, lb_p, aux_p)
    np.asarray(out[:1])  # compile + warm
    pipe_iters = max(1, int(os.environ.get("BENCH_DEVICE_PIPE_ITERS", "4")))
    t0 = time.perf_counter()
    outs = [
        pipe._program(face.variables, plate_vars, lb_p, aux_p)
        for _ in range(pipe_iters)
    ]
    for o in outs:  # one sync after all dispatches are queued
        np.asarray(o[:1])
    device_fps = pipe_iters * dev_batch / (time.perf_counter() - t0)

    # ---- MFU: XLA-costed flops of the fused program / chip peak.
    flops_per_frame = None
    mfu = None
    try:
        compiled = pipe._program.lower(
            face.variables, plate_vars, lb_dev, aux_dev
        ).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        total_flops = float(cost["flops"])
        flops_per_frame = total_flops / batch
        peak = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))  # v5e bf16
        mfu = device_fps * flops_per_frame / peak
    except Exception:  # noqa: BLE001  cost model unavailable on this backend
        pass

    # ---- fully-fused engine (detect + Pallas mosaic in one program; raw
    # uint8 frames both ways). Deployment shape for bandwidth-rich hosts.
    fused_fps = None
    fused_device_fps = None
    fused_device_fps_small = None
    fused_device_fps_nobox = None
    fused_device_fps_typical = None
    fused_device_fps_yuv = None
    typical_load = None
    if os.environ.get("BENCH_FUSED", "1") == "1":
        from video_desensitization_tpu.pipeline.engine import (
            DesensitizationEngine,
        )

        engine = DesensitizationEngine(face, plate, mosaic_level=8)
        engine.process_batch(frames)  # compile + warm
        fused_iters = int(os.environ.get("BENCH_FUSED_ITERS", "2"))
        t0 = time.perf_counter()
        for _ in range(fused_iters):
            engine.process_batch(frames)
        fused_fps = fused_iters * batch / (time.perf_counter() - t0)

        # fused_device_fps: the same fused program PIPELINED with frames
        # already device-resident (dispatches queued, one sync) — the
        # chip-side rate a PCIe-class host's pipeline would sustain, i.e.
        # the realistic engine=fused number that `engine=auto` extrapolates
        # to above its bandwidth threshold (cli/main.py pick_engine). The
        # tunnel-bound fused_fps above mostly measures this host's link.
        def _fused_device(bsz, iters, eng=None, fvars=None, pvars=None,
                          yuv=False):
            eng = eng or engine
            fvars = face.variables if fvars is None else fvars
            pvars = plate_vars if pvars is None else pvars
            reps = int(np.ceil(bsz / frames.shape[0]))
            stack = np.concatenate([frames] * reps)[:bsz]
            if yuv:
                from video_desensitization_tpu.ops.yuv import rgb_to_i420_host

                fr = jnp.asarray(np.stack([rgb_to_i420_host(f) for f in stack]))
            else:
                # engine programs take channel-interleaved (B, H, W*3) rows
                fr = jnp.asarray(stack.reshape(bsz, stack.shape[1], -1))
            sh = jnp.asarray(np.tile(frame_shape_row, (bsz, 1)))
            prog = eng.program(yuv=yuv, donate=True)
            donating = prog is not eng.program(yuv=yuv)
            if donating:
                # Production dispatch_batch donates the frames buffer (each
                # batch is a fresh transfer), killing XLA's defensive
                # pre-mosaic full-frame copy. Measure that shape: each
                # pipelined iteration consumes its own device-side copy,
                # staged before the clock starts (in production the copy IS
                # the h2d transfer, outside the chip-rate being measured).
                # HBM note: the staged feeds pin iters x batch full frames
                # (~796 MB per iteration at batch 128 / 1080p) — raising
                # BENCH_FUSED_DEVICE_ITERS well past the default 4 can OOM
                # at dev_batch sizes the non-donating path handled.
                feeds = [jnp.array(fr, copy=True) for _ in range(iters)]
                out = prog(fvars, pvars, fr, sh)  # warm; consumes fr
                np.asarray(out[2][:1])
                np.asarray(feeds[-1][:1, :1])  # copies materialized
                t0 = time.perf_counter()
                outs = [prog(fvars, pvars, f, sh) for f in feeds]
            else:
                out = prog(fvars, pvars, fr, sh)
                np.asarray(out[2][:1])  # compile + warm; sync small output
                t0 = time.perf_counter()
                outs = [prog(fvars, pvars, fr, sh) for _ in range(iters)]
            for o in outs:  # one sync after all dispatches are queued
                np.asarray(o[2][:1])
            return iters * bsz / (time.perf_counter() - t0)

        fd_iters = max(1, int(os.environ.get("BENCH_FUSED_DEVICE_ITERS", "4")))
        fused_device_fps_small = _fused_device(batch, fd_iters)
        fused_device_fps = _fused_device(dev_batch, fd_iters)

        # fused_device_fps_yuv: the planar-YUV IO variant of the same fused
        # program (detect on a bit-exact device I420->RGB conversion, mosaic
        # applied per plane) — the deployment shape that HALVES link bytes:
        # I420 is 1.5 B/px both ways vs RGB's 3 (see cli.main threshold
        # derivation). Same worst-case box load, device-resident, pipelined.
        if os.environ.get("BENCH_FUSED_YUV", "1") == "1":
            fused_device_fps_yuv = _fused_device(dev_batch, fd_iters, yuv=True)

        # fused_device_fps_nobox: the same fused program with confidence
        # above any possible score, so NMS keeps nothing and the mosaic
        # kernel skips every box. Random-init weights make the default
        # fused_device_fps a WORST-CASE mosaic load (max_detections giant
        # boxes per frame); this variant pins the opposite bound — the
        # detect + device-letterbox floor. Production sits between the
        # two, near this bound: the kernel's measured typical-load cost is
        # ~44 us/frame (benchmarks/mosaic_bench.py typical_faces).
        if os.environ.get("BENCH_FUSED_NOBOX", "1") == "1":
            face_nb, plate_nb = make_detectors(2.0, 2.0)
            engine_nb = DesensitizationEngine(face_nb, plate_nb, mosaic_level=8)
            fused_device_fps_nobox = _fused_device(
                dev_batch,
                fd_iters,
                eng=engine_nb,
                fvars=face_nb.variables,
                pvars=plate_nb.variables,
            )

        # fused_device_fps_typical: MEASURE the realistic mid-load point.
        # Top-k-capped detectors (max_detections = 3 faces / 1 plate, NMS
        # keeps exactly that many under random-init's saturated scores)
        # guarantee the stated ~3-faces + 1-plate per-frame load
        # STRUCTURALLY; box sizes remain random-init-large, so this still
        # overstates real footage's mosaic cost.
        if os.environ.get("BENCH_FUSED_TYPICAL", "1") == "1":
            face_t, plate_t = make_detectors(0.5, 0.5, face_k=3, plate_k=1)
            typical_load = [3, 1]
            engine_t = DesensitizationEngine(face_t, plate_t, mosaic_level=8)
            fused_device_fps_typical = _fused_device(
                dev_batch,
                fd_iters,
                eng=engine_t,
                fvars=face_t.variables,
                pvars=plate_t.variables,
            )

    # ---- link weather: h2d bandwidth probe. The e2e windows swing with the
    # host->chip link (tunneled here); recording the link rate alongside
    # makes any given run's e2e number interpretable on its own.
    link_mb = int(os.environ.get("BENCH_LINK_PROBE_MB", "1" if smoke else "24"))
    link_h2d_mbps = None
    if link_mb > 0:
        probe = np.zeros((link_mb << 20,), np.uint8)
        x = jax.device_put(probe)
        np.asarray(x[:1])  # warm + sync (block_until_ready unreliable on axon)
        rates = []
        for _ in range(2):
            t0 = time.perf_counter()
            x = jax.device_put(probe)
            np.asarray(x[:1])
            rates.append(link_mb / (time.perf_counter() - t0))
        link_h2d_mbps = max(rates)

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks",
        "cpu_baseline.json",
    )
    try:
        with open(baseline_path) as f:
            cpu_fps = float(json.load(f)["cpu_fps"])
    except (OSError, KeyError, ValueError):
        cpu_fps = None  # keep the output strict JSON (NaN is not)

    print(
        json.dumps(
            {
                "metric": "e2e_1080p_desensitization_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / cpu_fps, 2) if cpu_fps else None,
                "best_fps": round(best_fps, 2),
                "windows": [round(w, 2) for w in window_fps],
                "tracked_fps_i4": round(tracked_fps, 2) if tracked_fps else None,
                "tracked_fps_i4_typical": (
                    round(tracked_fps_typical, 2) if tracked_fps_typical else None
                ),
                "e2e_fps_typical": (
                    round(e2e_fps_typical, 2) if e2e_fps_typical else None
                ),
                "device_fps": round(device_fps, 2),
                "device_batch": dev_batch,
                "device_fps_sync_b%d" % batch: round(device_fps_sync, 2),
                "flops_per_frame": flops_per_frame,
                "mfu": round(mfu, 4) if mfu is not None else None,
                "fused_fps": round(fused_fps, 2) if fused_fps else None,
                "fused_device_fps": (
                    round(fused_device_fps, 2) if fused_device_fps else None
                ),
                "fused_device_fps_b%d" % batch: (
                    round(fused_device_fps_small, 2)
                    if fused_device_fps_small
                    else None
                ),
                "fused_device_fps_nobox": (
                    round(fused_device_fps_nobox, 2)
                    if fused_device_fps_nobox
                    else None
                ),
                "fused_device_fps_yuv": (
                    round(fused_device_fps_yuv, 2)
                    if fused_device_fps_yuv
                    else None
                ),
                "fused_device_fps_typical": (
                    round(fused_device_fps_typical, 2)
                    if fused_device_fps_typical
                    else None
                ),
                "typical_load": typical_load,
                "link_h2d_mbps": (
                    round(link_h2d_mbps, 1) if link_h2d_mbps else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
