"""Build-on-demand ctypes loader for the native BFP pack engine.

Compiles ``bfp_pack.cc`` with g++ the first time it is needed (cached next
to the source), then exposes numpy-in / numpy-out pack functions with the
exact layouts of ``kernels/packing.py``. Returns None handles and lets
callers fall back to the JAX path when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "bfp_pack.cc"
_LIB = Path(__file__).parent / "libbfp_pack.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", str(_LIB), str(_SRC), "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logger.warning(f"native bfp_pack build failed ({e}); using JAX pack")
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError as e:
            logger.warning(f"native bfp_pack load failed ({e})")
            return None
        i64, i32 = ctypes.c_int64, ctypes.c_int32
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        lib.bfp_pack_int8.argtypes = [
            f32p, i64, i64, i32, i32, i32, i32, i8p, f32p, i32,
        ]
        lib.bfp_pack_subbyte.argtypes = [
            f32p, i64, i64, i32, i32, i32, i32, u32p, f32p, i32,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _n_threads() -> int:
    return min(os.cpu_count() or 1, 16)


def _prep(w: np.ndarray, multiple: int):
    w = np.ascontiguousarray(w, dtype=np.float32)
    out, in_features = w.shape
    pad = (-in_features) % multiple
    if pad:
        w = np.pad(w, ((0, 0), (0, pad)))
    return w, out, in_features, w.shape[1]


def native_pack_int8(w, width, exponent_width=8, exponent_bias=None, block=16,
                     k_stride=None):
    """numpy [out, in] -> (codes int8 [out, in_pad], scales f32
    [out, in_pad/block]) or None if the native library is unavailable.
    ``k_stride``: pad K to this multiple (kernel K-tile alignment — must be
    a multiple of ``block``; mirrors ``pack_block_fp``)."""
    lib = _load()
    if lib is None:
        return None
    if k_stride:
        assert k_stride % block == 0, (k_stride, block)
    w, out, _, in_padded = _prep(np.asarray(w), k_stride or block)
    codes = np.empty((out, in_padded), dtype=np.int8)
    scales = np.empty((out, in_padded // block), dtype=np.float32)
    eb = -1 if exponent_bias in (None, "none", "None") else int(exponent_bias)
    lib.bfp_pack_int8(
        w, out, in_padded, width, exponent_width, eb, block, codes, scales,
        _n_threads(),
    )
    return codes, scales


def native_pack_subbyte(w, width, exponent_width=8, exponent_bias=None,
                        block=16):
    """numpy [out, in] -> (words uint32 [out, in_pad/per_word], scales uint8
    [n_tiles, out, tile/block] biased exponents 2^(u8-128)) or None if
    unavailable. The C++ engine emits f32 power-of-two scales; the exponent
    byte is extracted here (log2 of a power of two is exact, and a scale
    flushed to 0 maps to -inf -> clips to byte 0 — same as the JAX path)."""
    lib = _load()
    if lib is None:
        return None
    per_word = 32 // width
    tile = per_word * 128
    w, out, _, in_padded = _prep(np.asarray(w), tile)
    nt = in_padded // tile
    words = np.empty((out, in_padded // per_word), dtype=np.uint32)
    scales = np.empty((nt, out, tile // block), dtype=np.float32)
    eb = -1 if exponent_bias in (None, "none", "None") else int(exponent_bias)
    lib.bfp_pack_subbyte(
        w, out, in_padded, width, exponent_width, eb, block, words, scales,
        _n_threads(),
    )
    with np.errstate(divide="ignore"):
        e = np.round(np.log2(scales))
    return words, np.clip(e + 128, 0, 255).astype(np.uint8)
