"""Environment diagnostics: is this host/chip/toolchain ready to run?

    python -m video_desensitization_tpu.cli.doctor [--link]

Prints one JSON report covering what the reference checks ad hoc at startup
(codec probing combine_detect.py:53-89, env version logging :792-795, GPU
probe :299-304) plus the TPU-specific surfaces: device inventory, native
layer presence, record codec support, and (with --link) a host->device
bandwidth probe. Exit code 0 = everything required is present; 1 = a
required component is missing (devices may be CPU-only — that is reported
but not fatal, the framework runs on the CPU backend).
"""

from __future__ import annotations

import json
import sys


def collect(probe_link: bool = False) -> dict:
    report: dict = {"ok": True}

    import jax

    report["jax_version"] = jax.__version__
    devs = jax.devices()
    report["backend"] = jax.default_backend()
    report["devices"] = [str(d) for d in devs]
    report["n_devices"] = len(devs)

    import numpy as np

    report["numpy_version"] = np.__version__
    try:
        import cv2

        report["opencv_version"] = cv2.__version__
    except ImportError:
        report["opencv_version"] = None
        report["ok"] = False

    from video_desensitization_tpu.video.av import native_available

    report["native_av"] = native_available()
    if not report["native_av"]:
        report["ok"] = False  # record/video layer needs the C++ libav layer

    if report["native_av"]:
        from video_desensitization_tpu.video.frames import check_available_codecs

        report["codecs"] = check_available_codecs()

    try:
        from video_desensitization_tpu.record import lz4block

        report["native_lz4"] = bool(lz4block.native_available())
    except Exception:  # noqa: BLE001 — pure-Python fallback still works
        report["native_lz4"] = False

    import importlib.util

    report["torch_available"] = importlib.util.find_spec("torch") is not None

    if probe_link:
        from video_desensitization_tpu.cli.main import pick_engine, probe_link_gib_s

        gib_s = probe_link_gib_s()
        report["link_h2d_gib_s"] = round(gib_s, 3)  # gigaBYTES/s, not bits
        report["recommended_engine"] = pick_engine(gib_s)
        report["recommended_engine_yuv420"] = pick_engine(gib_s, "yuv420")

    return report


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="environment diagnostics")
    p.add_argument(
        "--link",
        action="store_true",
        help="also probe host->device bandwidth and recommend an engine",
    )
    args = p.parse_args(argv)
    report = collect(probe_link=args.link)
    print(json.dumps(report, indent=1))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
