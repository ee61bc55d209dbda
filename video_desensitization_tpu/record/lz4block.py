"""LZ4 *block* codec for record chunk compression (COMPRESS_LZ4).

Apollo Cyber RT compresses each record chunk body with raw LZ4 block calls
(``LZ4_compress_default`` / ``LZ4_decompress_safe``); the reference consumes
such records via cyber_record inside ``foreign/recordDeal.so``
(combine_detect.py:839). The fast path here is the clean-room C++ codec in
``video/native/vdt_lz4.cpp`` (built on demand, no external deps); when the
native library is unavailable this module falls back to a pure-Python
decoder and a literal-only encoder (the spec's trivial encoding — valid LZ4
that any decoder accepts, just uncompressed).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "video", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libvdt_lz4.so"))

_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR), "libvdt_lz4.so"],
                check=True,
                capture_output=True,
            )
        except (OSError, subprocess.CalledProcessError):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.vdt_lz4_decompress.restype = ctypes.c_long
    lib.vdt_lz4_decompress.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.c_void_p,
        ctypes.c_long,
    ]
    lib.vdt_lz4_compress.restype = ctypes.c_long
    lib.vdt_lz4_compress.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.c_void_p,
        ctypes.c_long,
    ]
    lib.vdt_lz4_compress_bound.restype = ctypes.c_long
    lib.vdt_lz4_compress_bound.argtypes = [ctypes.c_long]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def decompress(data: bytes, size_hint: int = 0) -> bytes:
    """Decompress one LZ4 block. ``size_hint`` (e.g. the chunk header's
    raw_size) avoids buffer-growth retries but is not required."""
    lib = _load()
    if lib is None:
        return _decompress_py(data)
    cap = max(int(size_hint), 4 * len(data), 1 << 16)
    for _ in range(12):  # growth capped: 64 KiB -> 256 GiB
        # np.empty: no zero-fill of the (possibly much larger) capacity;
        # tobytes() copies exactly the n decompressed bytes. The previous
        # create_string_buffer + .raw path zero-filled AND copied the full
        # capacity — 20x slower than the C call itself on 50 MB chunks.
        dst = np.empty(cap, np.uint8)
        n = lib.vdt_lz4_decompress(data, len(data), dst.ctypes.data, cap)
        if n >= 0:
            return dst[:n].tobytes()
        if n == -1:
            raise ValueError("malformed LZ4 block")
        cap *= 4  # -2: destination too small
    raise ValueError("LZ4 block decompressed size out of bounds")


def compress(data: bytes) -> bytes:
    lib = _load()
    if lib is None:
        return _compress_literal_py(data)
    cap = int(lib.vdt_lz4_compress_bound(len(data)))
    dst = np.empty(cap, np.uint8)
    n = lib.vdt_lz4_compress(data, len(data), dst.ctypes.data, cap)
    if n < 0:
        raise ValueError("LZ4 compression failed")
    return dst[:n].tobytes()


# -- pure-Python fallbacks ----------------------------------------------------


def _decompress_py(data: bytes) -> bytes:
    src = memoryview(data)
    n = len(src)
    out = bytearray()
    i = 0
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if i >= n:
                    raise ValueError("malformed LZ4 block")
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if i + lit > n:
            raise ValueError("malformed LZ4 block")
        out += src[i : i + lit]
        i += lit
        if i >= n:
            break
        if i + 2 > n:
            raise ValueError("malformed LZ4 block")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0 or offset > len(out):
            raise ValueError("malformed LZ4 block")
        mlen = token & 15
        if mlen == 15:
            while True:
                if i >= n:
                    raise ValueError("malformed LZ4 block")
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        start = len(out) - offset
        for j in range(mlen):  # overlap-safe byte copy
            out.append(out[start + j])
    return bytes(out)


def _compress_literal_py(data: bytes) -> bytes:
    """Literal-only LZ4 block (valid, uncompressed encoding)."""
    out = bytearray()
    lit = len(data)
    if lit >= 15:
        out.append(15 << 4)
        rem = lit - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    else:
        out.append(lit << 4)
    out += data
    return bytes(out)
