"""Generated protobuf modules for the cyber record container.

Regenerate with:  protoc --python_out=. cyber_record.proto sensor_image.proto
(done automatically on import if the _pb2 files are missing).
"""

import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))

for _name in ("cyber_record_pb2.py", "sensor_image_pb2.py"):
    if not os.path.exists(os.path.join(_HERE, _name)):
        subprocess.run(
            ["protoc", "--python_out=.", "cyber_record.proto", "sensor_image.proto"],
            cwd=_HERE,
            check=True,
        )
        break

from video_desensitization_tpu.record.proto import cyber_record_pb2, sensor_image_pb2  # noqa: E402

__all__ = ["cyber_record_pb2", "sensor_image_pb2"]
