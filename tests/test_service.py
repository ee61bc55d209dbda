"""Watch-folder serving daemon (pipeline/service.py): claims, journal,
failure isolation, HTTP status, crash recovery. The reference has no serving
story (one-shot run.sh); this is the resident-deployment surface."""

import json
import os
import threading
import time
import urllib.request

import numpy as np
import pytest

from video_desensitization_tpu.api.config import load_config
from video_desensitization_tpu.pipeline.service import (
    JOURNAL_NAME,
    DesensitizationService,
    ServiceConfig,
    group_inbox,
    load_service_config,
)
from video_desensitization_tpu.video.av import (
    VideoDecoder,
    VideoEncoder,
    native_available,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="native av layer unavailable"
)

FORMATS = ["h265", "hevc", "265", "mp4", "mov", "avi"]


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from video_desensitization_tpu.cli.main import build_engine

    tmp = tmp_path_factory.mktemp("cfg")
    ini = tmp / "config.ini"
    ini.write_text(
        "[PATHS]\nmodel_path=random\nmodel_weights=random\n"
        "record_dir=\noutput_h265_dir=\noutput_videos_dir=\n"
        "temp_directory_base=\nrecord_output_dir=\n"
        "[SETTINGS]\nbatch_size=4\n"
        "[TPU]\ninput_size=128\nmax_detections=8\ndtype=float32\n"
        "confidence=0.01\noutput_fps=30\n"
    )
    return build_engine(load_config(str(ini), strict=False), with_plates=False)


def _pcfg(tmp):
    ini = tmp / "pipe.ini"
    ini.write_text(
        "[PATHS]\nmodel_path=random\nmodel_weights=random\n"
        "record_dir=\noutput_h265_dir=\noutput_videos_dir=\n"
        "temp_directory_base=\nrecord_output_dir=\n"
        "[SETTINGS]\nbatch_size=4\n[TPU]\noutput_fps=30\n"
    )
    return load_config(str(ini), strict=False)


def _service(tmp, engine, **kw):
    scfg = ServiceConfig(
        inbox_dir=str(tmp / "inbox"),
        output_dir=str(tmp / "out"),
        poll_interval_s=0.05,
        stable_polls=0,
        **kw,
    )
    return DesensitizationService(scfg, _pcfg(tmp), engine)


def _write_video(path, frames=6, w=160, h=96):
    rng = np.random.default_rng(0)
    with VideoEncoder(str(path), w, h, fps=10, codec="mpeg4") as e:
        for _ in range(frames):
            e.write(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))


def test_group_inbox_segments_and_videos():
    jobs = group_inbox(
        [
            "b.record.00001",
            "a.record",
            "b.record.00000",
            "cam.mp4",
            "notes.txt",
            ".hidden.mp4",
            ".claim.b.record.lock",
            "c.record.1",  # unpadded segment index (unpack accepts these too)
            "c.record.0",
        ],
        FORMATS,
    )
    by_name = {j.name: j for j in jobs}
    assert set(by_name) == {"a.record", "b.record", "c.record", "cam.mp4"}
    assert by_name["b.record"].members == ["b.record.00000", "b.record.00001"]
    assert by_name["c.record"].members == ["c.record.0", "c.record.1"]
    assert by_name["a.record"].kind == "record"
    assert by_name["cam.mp4"].kind == "video"


def test_segment_set_claim_is_serialized_by_lock(tmp_path, engine):
    """A held set lock must make claim() back off (another worker is mid-way
    through renaming the set's members); a lock whose same-host owner is
    provably dead is broken."""
    svc = _service(tmp_path, engine)
    inbox = tmp_path / "inbox"
    (inbox / "x.record.00000").write_bytes(b"a")
    (inbox / "x.record.00001").write_bytes(b"b")
    jobs = svc.scan()
    assert len(jobs) == 1 and jobs[0].members == [
        "x.record.00000", "x.record.00001",
    ]
    lock = inbox / ".claim.x.record.lock"
    # dead same-host owner: pid from our own process tree that has exited
    import subprocess

    proc = subprocess.Popen(["true"])
    proc.wait()
    lock.write_text(f"{os.uname().nodename}:{proc.pid}\n")
    assert svc.claim(jobs[0]) is None  # fresh lock: mid-write race guard
    assert (inbox / "x.record.00000").exists()  # nothing moved
    old = time.time() - 120
    os.utime(lock, (old, old))
    assert svc.claim(jobs[0]) is None  # dead owner's stale lock broken...
    assert not lock.exists()
    d = svc.claim(jobs[0])  # ...and the claim succeeds on the next
    assert d is not None
    assert not lock.exists()  # released after the claim
    assert sorted(os.listdir(os.path.join(d, "in"))) == [
        "x.record.00000", "x.record.00001",
    ]


def test_live_owner_lock_is_never_broken(tmp_path, engine):
    """A lock held by a LIVE same-host process must survive any age: a
    worker stalled >60s mid-claim (NFS hiccup, swap storm) must not have its
    set stolen and split into two partial jobs."""
    svc = _service(tmp_path, engine)
    inbox = tmp_path / "inbox"
    (inbox / "y.record.00000").write_bytes(b"a")
    jobs = svc.scan()
    lock = inbox / ".claim.y.record.lock"
    lock.write_text(f"{os.uname().nodename}:{os.getpid()}\n")  # alive: us
    old = time.time() - 7200
    os.utime(lock, (old, old))
    assert svc.claim(jobs[0]) is None
    assert lock.exists()  # old but honest -> kept


def test_losing_claim_leaks_no_work_dir(tmp_path, engine):
    """A claim lost to a held set lock must not leave an empty work dir:
    one leaked dir per poll against a long-held lock grows without bound
    and recover_orphans skips dirs without in/."""
    svc = _service(tmp_path, engine)
    inbox = tmp_path / "inbox"
    (inbox / "w.record.00000").write_bytes(b"a")
    jobs = svc.scan()
    lock = inbox / ".claim.w.record.lock"
    lock.write_text(f"{os.uname().nodename}:{os.getpid()}\n")  # live owner
    for _ in range(3):
        assert svc.claim(jobs[0]) is None
    leftovers = [d for d in os.listdir(svc.cfg.work_dir)]
    assert leftovers == [], leftovers


def test_foreign_lock_breaks_only_on_orphan_grace_scale(tmp_path, engine):
    """Foreign-host owners can't be pid-probed; their stale locks age out on
    the orphan_grace_s horizon (when their partial claim becomes recoverable
    too), not after 60s."""
    svc = _service(tmp_path, engine, orphan_grace_s=100.0)
    inbox = tmp_path / "inbox"
    (inbox / "z.record.00000").write_bytes(b"a")
    jobs = svc.scan()
    lock = inbox / ".claim.z.record.lock"
    lock.write_text("some-other-host:12345\n")
    old = time.time() - 90  # < orphan_grace_s
    os.utime(lock, (old, old))
    assert svc.claim(jobs[0]) is None
    assert lock.exists()  # within grace -> kept
    old = time.time() - 200  # > orphan_grace_s
    os.utime(lock, (old, old))
    assert svc.claim(jobs[0]) is None  # broken this attempt
    assert not lock.exists()
    assert svc.claim(jobs[0]) is not None


def test_nfs_safe_link_lock_claims_exactly_once(tmp_path, engine):
    """The link(2)-count lock variant: two services racing the same set,
    exactly one wins; the loser backs off without disturbing the claim."""
    s1 = _service(tmp_path, engine, nfs_safe_locks=True)
    s2 = DesensitizationService(
        ServiceConfig(
            inbox_dir=str(tmp_path / "inbox"),
            output_dir=str(tmp_path / "out"),
            poll_interval_s=0.05,
            stable_polls=0,
            nfs_safe_locks=True,
        ),
        _pcfg(tmp_path),
        engine,
    )
    inbox = tmp_path / "inbox"
    (inbox / "w.record.00000").write_bytes(b"a")
    (inbox / "w.record.00001").write_bytes(b"b")
    j1, j2 = s1.scan(), s2.scan()
    d1 = s1.claim(j1[0])
    d2 = s2.claim(j2[0])
    assert (d1 is None) != (d2 is None)  # exactly one winner
    won = d1 or d2
    assert sorted(os.listdir(os.path.join(won, "in"))) == [
        "w.record.00000", "w.record.00001",
    ]
    assert not (inbox / ".claim.w.record.lock").exists()  # released
    assert not [n for n in os.listdir(inbox) if ".lock." in n]  # no tmp litter


def test_segment_set_membership_must_stabilize(tmp_path, engine):
    """A segment landing AFTER the first members must reset the set's
    claimability — else x.record.00000 is claimed alone mid-upload."""
    svc = DesensitizationService(
        ServiceConfig(
            inbox_dir=str(tmp_path / "inbox"),
            output_dir=str(tmp_path / "out"),
            stable_polls=1,
            poll_interval_s=0.0,
        ),
        _pcfg(tmp_path),
        engine,
    )
    inbox = tmp_path / "inbox"
    (inbox / "x.record.00000").write_bytes(b"a")
    assert svc.scan() == []  # file not yet stable
    assert svc.scan() == []  # file stable, membership history just started
    assert len(svc.scan()) == 1  # both gates satisfied
    (inbox / "x.record.00001").write_bytes(b"b")  # late segment arrives
    assert svc.scan() == []  # new member not yet stable
    assert svc.scan() == []  # membership changed: history restarted
    assert len(svc.scan()) == 1  # both gates re-satisfied
    assert svc.scan()[0].members == ["x.record.00000", "x.record.00001"]


def test_load_service_config(tmp_path):
    ini = tmp_path / "svc.ini"
    ini.write_text(
        "[PATHS]\nmodel_path=x\n"
        "[SERVICE]\ninbox_dir=/data/in\noutput_dir=/data/out\n"
        "poll_interval=0.5\nstable_polls=2\nhttp_port=0\ndelete_inputs=true\n"
    )
    cfg = load_service_config(str(ini))
    assert cfg.inbox_dir == "/data/in"
    assert cfg.poll_interval_s == 0.5
    assert cfg.stable_polls == 2
    assert cfg.http_port == 0
    assert cfg.delete_inputs
    assert cfg.work_dir == "/data/in/.work"
    # CLI overrides apply BEFORE derivation: work/done/failed follow the
    # overridden inbox tree (cli/serve.py --inbox/--out).
    over = load_service_config(str(ini), inbox_dir="/mnt/in2", output_dir="/mnt/o2")
    assert over.inbox_dir == "/mnt/in2"
    assert over.output_dir == "/mnt/o2"
    assert over.work_dir == "/mnt/in2/.work"
    assert over.done_dir == "/mnt/in2/.done"
    assert over.failed_dir == "/mnt/in2/.failed"
    # ...but an explicitly-configured work_dir is respected over derivation
    ini2 = tmp_path / "svc2.ini"
    ini2.write_text(
        "[SERVICE]\ninbox_dir=/data/in\noutput_dir=/data/out\n"
        "work_dir=/scratch/work\n"
    )
    over2 = load_service_config(str(ini2), inbox_dir="/mnt/in3")
    assert over2.work_dir == "/scratch/work"
    assert over2.done_dir == "/mnt/in3/.done"
    # overrides can also SUPPLY the required keys when the file omits them
    ini3 = tmp_path / "svc3.ini"
    ini3.write_text("[SERVICE]\npoll_interval=1.5\n")
    over3 = load_service_config(str(ini3), inbox_dir="/a", output_dir="/b")
    assert (over3.inbox_dir, over3.output_dir) == ("/a", "/b")
    assert over3.poll_interval_s == 1.5
    bad = tmp_path / "bad.ini"
    bad.write_text("[PATHS]\nmodel_path=x\n")
    with pytest.raises(ValueError, match="SERVICE"):
        load_service_config(str(bad))
    with pytest.raises(ValueError, match="requires"):
        load_service_config(str(ini3))  # no overrides, keys missing


@needs_native
def test_video_job_end_to_end(tmp_path, engine):
    svc = _service(tmp_path, engine)
    _write_video(tmp_path / "inbox" / "cam.mp4")
    handled = svc.run(max_jobs=1)
    assert handled == 1

    out = tmp_path / "out" / "cam_processed.mp4"
    assert out.exists()
    with VideoDecoder(str(out)) as dec:
        assert sum(1 for _ in dec) == 6
    # Input archived, inbox empty, journal records the job.
    assert (tmp_path / "inbox" / ".done" / "cam.mp4").exists()
    assert not any(
        f for f in os.listdir(tmp_path / "inbox") if not f.startswith(".")
    )
    lines = [
        json.loads(l)
        for l in (tmp_path / "out" / "service_journal.jsonl").read_text().splitlines()
    ]
    assert len(lines) == 1 and lines[0]["ok"] and lines[0]["frames"] == 6
    assert svc.status["jobs_done"] == 1 and svc.status["frames"] == 6


@needs_native
def test_record_job_end_to_end(tmp_path, engine):
    from video_desensitization_tpu.record.proto import sensor_image_pb2 as sp
    from video_desensitization_tpu.record.reader import RecordReader
    from video_desensitization_tpu.record.topics import (
        CAMERA_TOPICS,
        COMPRESSED_IMAGE_TYPE,
    )
    from video_desensitization_tpu.record.writer import RecordWriter
    from video_desensitization_tpu.video.av import PacketDemuxer

    h265 = str(tmp_path / "src.h265")
    with VideoEncoder(h265, 64, 64, fps=30, codec="libx265",
                      bitrate=200000, preset="ultrafast") as e:
        for i in range(6):
            e.write(np.full((64, 64, 3), i * 30, np.uint8))
    with PacketDemuxer(h265) as dm:
        pkts = dm.read_packets()

    svc = _service(tmp_path, engine)
    topic = CAMERA_TOPICS[0]
    rec = tmp_path / "inbox" / "drive.record"
    with RecordWriter(str(rec)) as w:
        w.write_channel(topic, COMPRESSED_IMAGE_TYPE)
        for i, p in enumerate(pkts):
            img = sp.CompressedImage(format="h265", data=p.data)
            img.header.sequence_num = i
            w.write_message(topic, img, 10**9 + i * 33_000_000)

    handled = svc.run(max_jobs=1)
    assert handled == 1
    out_rec = tmp_path / "out" / "drive.record" / "record" / "drive.record"
    assert out_rec.exists()
    msgs = list(RecordReader(str(out_rec)).read_messages(topic))
    assert len(msgs) == len(pkts)
    assert (tmp_path / "inbox" / ".done" / "drive.record").exists()
    # Work dir cleaned up.
    assert os.listdir(tmp_path / "inbox" / ".work") == []


@needs_native
def test_failed_job_isolated_and_archived(tmp_path, engine):
    svc = _service(tmp_path, engine)
    (tmp_path / "inbox" / "broken.mp4").write_bytes(b"not a video at all")
    _write_video(tmp_path / "inbox" / "good.mp4")
    handled = svc.run(max_jobs=2)
    assert handled == 2
    # The bad job is quarantined with its error; the good one still processed.
    assert (tmp_path / "inbox" / ".failed" / "broken.mp4").exists()
    assert (tmp_path / "inbox" / ".failed" / "broken.mp4.error.txt").exists()
    assert (tmp_path / "out" / "good_processed.mp4").exists()
    assert svc.status["jobs_failed"] == 1 and svc.status["jobs_done"] == 1


def test_claim_is_atomic_across_workers(tmp_path, engine):
    s1 = _service(tmp_path, engine)
    s2 = DesensitizationService(
        ServiceConfig(
            inbox_dir=str(tmp_path / "inbox"),
            output_dir=str(tmp_path / "out2"),
            work_dir=str(tmp_path / "work2"),
            stable_polls=0,
        ),
        _pcfg(tmp_path),
        engine,
    )
    (tmp_path / "inbox" / "x.mp4").write_bytes(b"\x00" * 64)
    jobs1, jobs2 = s1.scan(), s2.scan()
    assert len(jobs1) == 1 and len(jobs2) == 1
    d1 = s1.claim(jobs1[0])
    d2 = s2.claim(jobs2[0])
    assert (d1 is None) != (d2 is None), "exactly one worker must win"


def test_recover_orphans_dead_worker_only(tmp_path, engine):
    import subprocess

    svc = _service(tmp_path, engine)
    work = tmp_path / "inbox" / ".work"

    # A work dir claimed by a provably-dead same-host pid -> re-queued.
    proc = subprocess.Popen(["true"])
    proc.wait()
    dead = work / "dead.mp4.1.1"
    (dead / "in").mkdir(parents=True)
    (dead / "in" / "dead.mp4").write_bytes(b"x")
    (dead / "job.json").write_text(
        json.dumps({"name": "dead.mp4", "kind": "video",
                    "members": ["dead.mp4"],
                    "host": os.uname().nodename, "pid": proc.pid})
    )
    # A work dir claimed by a live pid (ourselves) -> left alone.
    live = work / "live.mp4.2.1"
    (live / "in").mkdir(parents=True)
    (live / "in" / "live.mp4").write_bytes(b"y")
    (live / "job.json").write_text(
        json.dumps({"name": "live.mp4", "kind": "video",
                    "members": ["live.mp4"],
                    "host": os.uname().nodename, "pid": os.getpid()})
    )
    # A fresh foreign-host claim (can't probe) -> presumed in flight.
    foreign = work / "far.mp4.3.1"
    (foreign / "in").mkdir(parents=True)
    (foreign / "in" / "far.mp4").write_bytes(b"z")
    (foreign / "job.json").write_text(
        json.dumps({"name": "far.mp4", "kind": "video",
                    "members": ["far.mp4"], "host": "other-host", "pid": 1})
    )
    assert svc.recover_orphans() == 1
    assert (tmp_path / "inbox" / "dead.mp4").exists()
    assert (live / "in" / "live.mp4").exists()
    assert (foreign / "in" / "far.mp4").exists()

    # Once the foreign claim ages past the grace period it is reclaimed.
    old = time.time() - svc.cfg.orphan_grace_s - 10
    os.utime(foreign / "job.json", (old, old))
    assert svc.recover_orphans() == 1
    assert (tmp_path / "inbox" / "far.mp4").exists()


def test_http_status_endpoint(tmp_path, engine):
    svc = _service(tmp_path, engine, http_port=0)
    try:
        assert svc.http_port
        base = f"http://127.0.0.1:{svc.http_port}"
        assert urllib.request.urlopen(f"{base}/healthz").read() == b"ok\n"
        status = json.loads(urllib.request.urlopen(f"{base}/status").read())
        assert status["jobs_done"] == 0
        assert "uptime_s" in status
        metrics = urllib.request.urlopen(f"{base}/metrics").read().decode()
        assert "# TYPE vdt_jobs_done counter" in metrics
        assert "vdt_busy 0" in metrics
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(f"{base}/nope")
    finally:
        svc.shutdown()


def test_complete_marker_bypasses_stability_gates(tmp_path, engine):
    """An uploader-written <name>.complete marker makes completeness exact:
    claimable on the first scan despite strict stability settings, and the
    marker is consumed with the claim."""
    svc = DesensitizationService(
        ServiceConfig(
            inbox_dir=str(tmp_path / "inbox"),
            output_dir=str(tmp_path / "out"),
            stable_polls=3,
            poll_interval_s=60.0,
        ),
        _pcfg(tmp_path),
        engine,
    )
    inbox = tmp_path / "inbox"
    (inbox / "x.record.00000").write_bytes(b"a")
    (inbox / "x.record.00001").write_bytes(b"b")
    assert svc.scan() == []  # no marker: stability gates apply
    (inbox / "x.record.complete").write_bytes(b"")
    jobs = svc.scan()
    assert len(jobs) == 1 and jobs[0].complete
    d = svc.claim(jobs[0])
    assert d is not None
    assert not (inbox / "x.record.complete").exists()  # consumed
    assert sorted(os.listdir(os.path.join(d, "in"))) == [
        "x.record.00000", "x.record.00001",
    ]


def test_stability_gate_defers_growing_files(tmp_path, engine):
    svc = DesensitizationService(
        ServiceConfig(
            inbox_dir=str(tmp_path / "inbox"),
            output_dir=str(tmp_path / "out"),
            stable_polls=1,
            poll_interval_s=0.0,  # no spacing requirement for this unit test
        ),
        _pcfg(tmp_path),
        engine,
    )
    f = tmp_path / "inbox" / "up.mp4"
    f.write_bytes(b"a" * 10)
    assert svc.scan() == []  # first sighting: not yet stable
    f.write_bytes(b"a" * 20)  # still uploading
    os.utime(f, (1, 1))  # force distinct mtime signature
    assert svc.scan() == []
    assert svc.scan() != []  # unchanged across a full poll -> claimable


def test_stable_polls_zero_claims_on_first_sight(tmp_path, engine):
    """stable_polls=0 is a documented opt-out of upload protection: a file
    is claimable the scan it first appears, with no unchanged-interval
    evidence (ServiceConfig.stable_polls docstring)."""
    svc = _service(tmp_path, engine)  # stable_polls=0
    f = tmp_path / "inbox" / "up.mp4"
    f.write_bytes(b"a" * 10)
    jobs = svc.scan()
    assert [j.name for j in jobs] == ["up.mp4"]  # first sighting, claimable
    assert svc.claim(jobs[0]) is not None


def test_heartbeat_keeps_job_json_fresh(tmp_path, engine):
    """run_job touches job.json while the job runs, so a foreign worker's
    age-based _owner_alive check sees liveness, not claim time."""
    svc = _service(tmp_path, engine, heartbeat_interval_s=0.05)
    job_dir = tmp_path / "inbox" / ".work" / "j"
    job_dir.mkdir(parents=True)
    meta = job_dir / "job.json"
    meta.write_text("{}")
    old = time.time() - 3600
    os.utime(meta, (old, old))
    stop = svc._start_heartbeat(str(job_dir))
    try:
        deadline = time.time() + 5.0
        while os.stat(meta).st_mtime < time.time() - 10 and time.time() < deadline:
            time.sleep(0.05)
        assert os.stat(meta).st_mtime > time.time() - 10  # refreshed
    finally:
        stop.set()


def test_journal_rotation(tmp_path, engine):
    svc = _service(tmp_path, engine, journal_max_bytes=200)
    for i in range(50):
        svc._journal({"ts": i, "job": "x", "ok": True})
    rotated = tmp_path / "out" / (JOURNAL_NAME + ".1")
    live = tmp_path / "out" / JOURNAL_NAME
    assert rotated.exists()
    assert live.exists() and live.stat().st_size <= 300
    # every line in both generations is valid JSON
    for p in (rotated, live):
        for line in p.read_text().splitlines():
            json.loads(line)


def test_stability_gate_requires_poll_spacing(tmp_path, engine):
    """Back-to-back scans (the post-claim immediate rescan) must NOT count
    as stability evidence — observations need real time between them."""
    svc = DesensitizationService(
        ServiceConfig(
            inbox_dir=str(tmp_path / "inbox"),
            output_dir=str(tmp_path / "out"),
            stable_polls=1,
            poll_interval_s=60.0,
        ),
        _pcfg(tmp_path),
        engine,
    )
    f = tmp_path / "inbox" / "up.mp4"
    f.write_bytes(b"a" * 10)
    for _ in range(5):  # rapid rescans prove nothing
        assert svc.scan() == []


@needs_native
def test_two_workers_share_one_inbox(tmp_path, engine):
    """Two daemons polling the same inbox concurrently: every job is
    processed exactly once (claims are atomic renames), no job is lost,
    and the workers' combined journals account for all inputs."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    n_jobs = 4
    for i in range(n_jobs):
        _write_video(inbox / f"cam{i}.mp4", frames=4)

    services = [
        DesensitizationService(
            ServiceConfig(
                inbox_dir=str(inbox),
                output_dir=str(tmp_path / f"out{k}"),
                work_dir=str(tmp_path / f"work{k}"),
                poll_interval_s=0.05,
                stable_polls=0,
            ),
            _pcfg(tmp_path),
            engine,
        )
        for k in range(2)
    ]
    stop = threading.Event()
    counts = [0, 0]

    def run(k):
        counts[k] = services[k].run(stop)

    threads = [threading.Thread(target=run, args=(k,)) for k in range(2)]
    for t in threads:
        t.start()
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        done = sum(s.status["jobs_done"] + s.status["jobs_failed"] for s in services)
        if done >= n_jobs and not any(
            f for f in os.listdir(inbox) if not f.startswith(".")
        ):
            break
        time.sleep(0.2)
    stop.set()
    for t in threads:
        t.join(timeout=60)

    outputs = []
    for k in range(2):
        d = tmp_path / f"out{k}"
        if d.exists():
            outputs += [f for f in os.listdir(d) if f.endswith("_processed.mp4")]
    assert sorted(outputs) == sorted(
        f"cam{i}_processed.mp4" for i in range(n_jobs)
    ), "each job must be processed exactly once across the two workers"
    assert sum(counts) == n_jobs
    assert sum(s.status["jobs_failed"] for s in services) == 0


def test_graceful_stop_between_jobs(tmp_path, engine):
    svc = _service(tmp_path, engine)
    stop = threading.Event()
    stop.set()
    assert svc.run(stop) == 0


@needs_native
def test_serve_cli_end_to_end(tmp_path):
    """The full daemon entrypoint: config + flags -> engine -> one job."""
    from video_desensitization_tpu.cli.serve import main as serve_main

    ini = tmp_path / "config.ini"
    ini.write_text(
        "[PATHS]\nmodel_path=random\nmodel_weights=random\n"
        "record_dir=\noutput_h265_dir=\noutput_videos_dir=\n"
        "temp_directory_base=\nrecord_output_dir=\n"
        "[SETTINGS]\nbatch_size=4\n"
        "[TPU]\ninput_size=128\nmax_detections=8\ndtype=float32\n"
        "confidence=0.01\noutput_fps=30\n"
        f"[SERVICE]\ninbox_dir={tmp_path / 'inbox'}\n"
        f"output_dir={tmp_path / 'out'}\n"
        "poll_interval=0.05\nstable_polls=0\n"
    )
    os.makedirs(tmp_path / "inbox")
    _write_video(tmp_path / "inbox" / "cam.mp4")
    rc = serve_main([str(ini), "--no-plates", "--max-jobs", "1"])
    assert rc == 0
    assert (tmp_path / "out" / "cam_processed.mp4").exists()
