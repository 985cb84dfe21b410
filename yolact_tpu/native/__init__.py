"""ctypes loader for the native helper library (native/yolact_native.cpp).

Builds the shared library on first use with g++ if it isn't present; every
caller falls back to pure numpy when no toolchain is available, so the
framework works (more slowly) without it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_lock = threading.Lock()
_native = None
_tried = False

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
# search order: explicit override, repo layout (../../../native), then the
# copy bundled into wheels (_src/ — kept in sync with native/ by
# tests/test_rle_native.py::test_bundled_native_source_in_sync)
_SRC_DIRS = [
    d for d in (
        os.environ.get('YOLACT_TPU_NATIVE_DIR'),
        os.path.join(os.path.dirname(os.path.dirname(_PKG_DIR)), 'native'),
        os.path.join(_PKG_DIR, '_src'),
    ) if d
]


class Native:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.rle_encode_counts.restype = ctypes.c_int64
        lib.rle_encode_counts.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_char_p]
        lib.rle_decode_counts.restype = ctypes.c_int64
        lib.rle_decode_counts.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint32)]
        lib.rle_decode_mask.restype = ctypes.c_int32
        lib.rle_decode_mask.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.greedy_nms.restype = ctypes.c_int64
        lib.greedy_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int64)]

    def rle_encode_counts(self, counts: np.ndarray) -> bytes:
        counts = np.ascontiguousarray(counts, np.int64)
        out = ctypes.create_string_buffer(8 * max(1, len(counts)))
        n = self._lib.rle_encode_counts(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(counts), out)
        return out.raw[:n]

    def rle_decode_counts(self, s: bytes) -> np.ndarray:
        out = np.empty(max(1, len(s)), np.uint32)
        n = self._lib.rle_decode_counts(
            s, len(s), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
        return out[:n].copy()

    def rle_decode_mask(self, s: bytes, h: int, w: int) -> np.ndarray:
        mask = np.empty(h * w, np.uint8)
        rc = self._lib.rle_decode_mask(
            s, len(s), h, w,
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            # pycocotools raises here too — a silently truncated gt mask
            # corrupts training/eval with no diagnostic
            raise ValueError(
                f'RLE runs exceed mask size {h}x{w} (corrupt annotation '
                'or swapped height/width)')
        return mask.reshape((h, w), order='F').astype(bool)

    def greedy_nms(self, dets: np.ndarray, thresh: float) -> np.ndarray:
        """dets [n, 5] float32 (x1,y1,x2,y2,score) -> kept indices."""
        dets = np.ascontiguousarray(dets, np.float32)
        keep = np.empty(len(dets), np.int64)
        n = self._lib.greedy_nms(
            dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(dets), thresh,
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return keep[:n].copy()


def _build_in(src_dir: str) -> Optional[str]:
    src = os.path.join(src_dir, 'yolact_native.cpp')
    if not os.path.exists(src):
        return None
    out_dirs = [src_dir]
    # installed (non-editable) packages may live in a read-only
    # site-packages: fall back to a per-user cache dir
    cache = os.path.join(os.path.expanduser('~'), '.cache', 'yolact_tpu')
    out_dirs.append(cache)
    for out_dir in out_dirs:
        so = os.path.join(out_dir, 'libyolact_native.so')
        if os.path.exists(so) and \
                os.path.getmtime(so) >= os.path.getmtime(src):
            return so
        try:
            os.makedirs(out_dir, exist_ok=True)
            # compile to a per-pid temp then atomically rename: concurrent
            # processes (parallel eval shards) must never CDLL a
            # half-written .so (the in-process _lock can't exclude other
            # processes)
            tmp = f'{so}.{os.getpid()}.tmp'
            subprocess.run(['g++', '-O3', '-fPIC', '-std=c++17', '-shared',
                            '-o', tmp, src], check=True, capture_output=True)
            os.replace(tmp, so)
            return so
        except (subprocess.CalledProcessError, FileNotFoundError, OSError,
                PermissionError):
            continue
    return None


def _build() -> Optional[str]:
    for src_dir in _SRC_DIRS:
        so = _build_in(src_dir)
        if so is not None:
            return so
    return None


def get_native() -> Optional[Native]:
    global _native, _tried
    if _tried:
        return _native
    with _lock:
        if _tried:
            return _native
        so = _build()
        if so is not None:
            try:
                _native = Native(ctypes.CDLL(so))
            except OSError:
                _native = None
        _tried = True
    return _native
