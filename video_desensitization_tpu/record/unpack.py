"""Record unpack: extract camera topics as .h265 elementary streams.

Behavior parity with ``recordDeal.read_record2h265_all`` (SURVEY.md §3.4):
enumerate ``.record`` files, stage a ``.tmp_record`` copy, iterate messages,
gate each camera topic on its first keyframe (``video_states`` /
``key_frame_written``), and write per-topic Annex-B streams to
``<output_h265_dir>/hevcs/topic_<camera>.h265`` with per-topic work fanned
out on a thread pool ("Start concurrent record to video!").
"""

from __future__ import annotations

import os
import shutil
from concurrent.futures import ThreadPoolExecutor, as_completed
from typing import Dict, List, Optional, Sequence

from google.protobuf.message import DecodeError

from video_desensitization_tpu.record.reader import RecordReader
from video_desensitization_tpu.record.topics import (
    CAMERA_TOPICS,
    HEVC_SUBDIR,
    hevc_filename_for_topic,
)
from video_desensitization_tpu.utils.logging import get_logger
from video_desensitization_tpu.video.nal import is_hevc_keyframe


def get_tmp_record_path(record_path: str) -> str:
    """'Generate intermediate record file': <name>.tmp_record staging path."""
    if record_path.endswith(".record"):
        return record_path[: -len(".record")] + ".tmp_record"
    return record_path + ".tmp_record"


def _list_records(record_dir: str) -> List[str]:
    if os.path.isfile(record_dir):
        return [record_dir]
    out = []
    for name in sorted(os.listdir(record_dir)):
        if ".record" in name and not name.endswith(".tmp_record"):
            out.append(os.path.join(record_dir, name))
    return out


def read_record2h265_all(
    record_dir: str,
    output_h265_dir: str,
    topics: Sequence[str] = CAMERA_TOPICS,
    use_tmp_copy: bool = True,
) -> Dict[str, str]:
    """Extract every camera topic of every record to .h265 files.

    Returns {topic: h265_path} for topics that had data.
    """
    log = get_logger("recordDeal")
    hevc_dir = os.path.join(output_h265_dir, HEVC_SUBDIR)
    os.makedirs(hevc_dir, exist_ok=True)
    records = _list_records(record_dir)
    if not records:
        log.warning("no .record files under %s", record_dir)
        return {}

    # Per-topic streaming state: keyframe gating + accumulated payload.
    video_states = {
        t: {"key_frame_written": False, "topic_data": bytearray()} for t in topics
    }

    log.info("Extract the camera topic from the record file as H265 file")
    for record_path in records:
        work_path = record_path
        tmp_path = None
        if use_tmp_copy:
            tmp_path = get_tmp_record_path(record_path)
            log.info("Generate intermediate record file: %s", tmp_path)
            shutil.copyfile(record_path, tmp_path)
            work_path = tmp_path
        try:
            reader = RecordReader(work_path)
            for topic, msg, _t in reader.read_messages(list(topics)):
                try:
                    data = bytes(msg.data)
                except (AttributeError, DecodeError) as e:
                    log.error("The record %s data exception: %s", record_path, e)
                    continue
                state = video_states[topic]
                if not state["key_frame_written"]:
                    if not is_hevc_keyframe(data):
                        continue
                    state["key_frame_written"] = True
                state["topic_data"].extend(data)
        finally:
            if tmp_path and os.path.exists(tmp_path):
                os.remove(tmp_path)

    log.info("Start concurrent record to video!")
    results: Dict[str, str] = {}

    def decode_h265(topic: str) -> Optional[str]:
        state = video_states[topic]
        if not state["topic_data"]:
            return None
        h265_path = os.path.join(hevc_dir, hevc_filename_for_topic(topic))
        with open(h265_path, "wb") as f:
            f.write(bytes(state["topic_data"]))
        return h265_path

    with ThreadPoolExecutor() as pool:
        futures = {pool.submit(decode_h265, t): t for t in topics}
        for fut in as_completed(futures):
            topic = futures[fut]
            try:
                path = fut.result()
            except Exception as e:  # noqa: BLE001
                log.error("Error processing topic %s is exception: %s", topic, e)
                continue
            if path:
                results[topic] = path
    return results
