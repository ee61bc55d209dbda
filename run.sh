#!/usr/bin/env bash
# Launcher with environment checks — parity with the reference's run.sh
# (/root/reference/run.sh:1-42), TPU edition.
set -euo pipefail
cd "$(dirname "$0")"

CONFIG="${1:-config.ini}"

if ! command -v python3 >/dev/null; then
    echo "ERROR: python3 not found" >&2
    exit 1
fi

python3 - <<'EOF'
import sys
try:
    import jax
except ImportError:
    sys.exit("ERROR: jax not installed")
devs = jax.devices()
print(f"jax {jax.__version__} | backend: {jax.default_backend()} | devices: {devs}")
if jax.default_backend() == "cpu":
    print("WARNING: no TPU detected - running on CPU backend")
EOF

if [ ! -f "$CONFIG" ]; then
    echo "ERROR: config file '$CONFIG' not found" >&2
    exit 1
fi

exec python3 -m video_desensitization_tpu.cli.main "$CONFIG"
