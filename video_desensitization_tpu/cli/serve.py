"""Serving entrypoint: resident watch-folder desensitization daemon.

    python -m video_desensitization_tpu.cli.serve config.ini \
        [--inbox DIR --out DIR] [--port N] [--max-jobs N]

The config.ini supplies the model checkpoints and pipeline settings (same
file the one-shot CLI uses, cli/main.py) plus an optional [SERVICE] section:

    [SERVICE]
    inbox_dir = /data/inbox
    output_dir = /data/out
    poll_interval = 2.0
    stable_polls = 1
    http_port = 8080
    delete_inputs = false

Drop `.record` files (or `.record.0000N` segment sets, or plain videos) into
the inbox; outputs land under output_dir, finished inputs move to
`<inbox>/.done` (`.failed` + error.txt on error), and every job appends one
JSON line to `<output_dir>/service_journal.jsonl`. Uploads are claimed once
their size/membership is stable across polls; uploaders that can signal
completeness exactly should write a `<name>.complete` marker file LAST —
the job is then claimed on the next scan, no heuristics. Multiple daemons (one per
TPU host) may share one inbox — claims are atomic renames. SIGTERM/SIGINT
drain gracefully: the in-flight job finishes, then the daemon exits 0.

The reference has no serving story (one-shot run.sh, SURVEY.md §1 L6); this
is the deployment shape that amortizes model load + XLA compile across jobs.
"""

from __future__ import annotations

import argparse
import signal
import sys
import threading


def main(argv=None) -> int:
    from video_desensitization_tpu.api.config import load_config
    from video_desensitization_tpu.cli.main import build_engine
    from video_desensitization_tpu.pipeline.service import (
        DesensitizationService,
        ServiceConfig,
        load_service_config,
    )
    from video_desensitization_tpu.utils.logging import setup_logger

    p = argparse.ArgumentParser(description="TPU desensitization service")
    p.add_argument("config", nargs="?", default="config.ini")
    p.add_argument("--inbox", help="watch directory (overrides [SERVICE])")
    p.add_argument("--out", help="output directory (overrides [SERVICE])")
    p.add_argument("--port", type=int, help="HTTP status port (0 = ephemeral)")
    p.add_argument("--poll", type=float, help="poll interval seconds")
    p.add_argument("--max-jobs", type=int, help="exit after N jobs (smoke tests)")
    p.add_argument("--no-plates", action="store_true")
    p.add_argument("--allow-random-weights", action="store_true")
    args = p.parse_args(argv)

    log = setup_logger()
    pcfg = load_config(args.config, strict=False)
    try:
        # --inbox/--out are applied BEFORE ServiceConfig is constructed so
        # the derived work/done/failed dirs follow the override (mutating
        # inbox_dir afterwards would leave them under the old tree, or fail
        # the same-filesystem startup check).
        scfg = load_service_config(
            args.config, inbox_dir=args.inbox, output_dir=args.out
        )
    except ValueError:
        if not (args.inbox and args.out):
            raise SystemExit(
                "no [SERVICE] section in config and no --inbox/--out given"
            )
        scfg = ServiceConfig(inbox_dir=args.inbox, output_dir=args.out)
    if args.port is not None:
        scfg.http_port = args.port
    if args.poll is not None:
        scfg.poll_interval_s = args.poll

    engine = build_engine(
        pcfg,
        with_plates=not args.no_plates,
        allow_random=args.allow_random_weights,
    )
    service = DesensitizationService(scfg, pcfg, engine)

    stop = threading.Event()

    def _drain(signum, frame):
        log.info("signal %d: draining (current job will finish)", signum)
        stop.set()

    signal.signal(signal.SIGTERM, _drain)
    signal.signal(signal.SIGINT, _drain)

    handled = service.run(stop, max_jobs=args.max_jobs)
    log.info("service exiting after %d job(s)", handled)
    return 0


if __name__ == "__main__":
    sys.exit(main())
