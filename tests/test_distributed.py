"""TRUE multi-process distributed test (non-degenerate multihost path).

Spawns a reference single-process run (8 virtual CPU devices) and then TWO
worker processes (4 virtual CPU devices each) that jax.distributed.initialize
against a localhost coordinator, build the global 8-device mesh, feed only
their local half of the batch via shard_batch_multihost, run one sharded
train step + shard_mapped inference, and assert equality with the reference.

This is the real 2-process path the in-suite tests can only exercise at
process_count == 1 (tests/test_multidevice.py). Reference analog:
nn.DataParallel at pod scale (reference detect_face/face.py:56).
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "distributed_worker.py")


def _env(cache_dir=None):
    env = dict(os.environ)
    # the worker script pins platform/device-count via jax.config; scrub any
    # inherited flags that could fight it
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_TPU_TESTS", None)
    if cache_dir is not None:
        # Shared per-run compilation cache: the reference run primes it, so
        # the two workers (identical SPMD programs) mostly skip compilation.
        # Two fresh interpreters compiling in lockstep on a loaded 1-core
        # host otherwise skew past the coordination service's fixed barrier
        # deadlines (observed: Shutdown barrier DEADLINE_EXCEEDED).
        env["JAX_COMPILATION_CACHE_DIR"] = str(cache_dir)
    return env


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(ref, cache_dir):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                WORKER,
                "--mode",
                "worker",
                "--process-id",
                str(i),
                "--num-processes",
                "2",
                "--coordinator",
                f"127.0.0.1:{port}",
                "--ref",
                str(ref),
            ],
            env=_env(cache_dir),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return [p.returncode for p in procs], outs


def test_two_process_distributed_matches_single_process(tmp_path):
    ref = tmp_path / "ref.npz"
    cache_dir = tmp_path / "jaxcache"
    r = subprocess.run(
        [sys.executable, WORKER, "--mode", "reference", "--out", str(ref)],
        env=_env(cache_dir),
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert r.returncode == 0, f"reference run failed:\n{r.stdout}\n{r.stderr}"
    assert ref.exists()

    # Coordination-service barrier/heartbeat timeouts happen when the host
    # is heavily loaded (two fresh interpreters compiling in lockstep can
    # skew past the service's fixed barrier deadlines). That is
    # test-infrastructure weather, not a sharding bug: retry up to 3
    # attempts total. A numeric mismatch ("compare FAILED") is never
    # retried — it fails immediately.
    for attempt in range(3):
        rcs, outs = _run_workers(ref, cache_dir)
        ok = all(rc == 0 for rc in rcs)
        if ok or any("compare FAILED" in o for o in outs):
            break
    for i, (rc, out) in enumerate(zip(rcs, outs)):
        assert rc == 0, f"worker {i} failed (rc={rc}):\n{out}"
    assert "compare ok" in outs[0], outs[0]
