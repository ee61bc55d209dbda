"""Video and frame I/O: native libav layer + OpenCV fallback."""

from video_desensitization_tpu.video.av import (
    VideoDecoder,
    VideoEncoder,
    PacketDemuxer,
    native_available,
)
from video_desensitization_tpu.video.frames import (
    convert_video_to_frames,
    create_video,
    iter_frames,
)

__all__ = [
    "VideoDecoder",
    "VideoEncoder",
    "PacketDemuxer",
    "native_available",
    "convert_video_to_frames",
    "create_video",
    "iter_frames",
]
