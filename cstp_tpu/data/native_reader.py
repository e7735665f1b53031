"""ctypes binding for the native CSTPack reader (native/cstpack_reader.cc).

The C++ library mmaps the shard, decodes JPEG via libjpeg, bilinear-resizes
to the ingest resolution, and fills whole batch tensors with a pthread pool —
replacing the reference's LMDB + msgpack + PIL per-frame Python path
(datasets.py:502-534). Builds on first use via ``make``; falls back to the
pure-Python PackedDataset if the toolchain/libjpeg is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libcstpack.so"))
# Wheel/sdist installs ship the compiled library as package data next to this
# module (setup.py BuildPyWithNative); the repo checkout keeps it in native/.
_PACKAGED_LIB_PATH = os.path.join(os.path.dirname(__file__), "libcstpack.so")

_lib = None


def _build_lib() -> Optional[str]:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True,
        )
        return _LIB_PATH if os.path.exists(_LIB_PATH) else None
    except Exception:
        return None


def _find_lib() -> Optional[str]:
    env = os.environ.get("CSTP_NATIVE_LIB")
    if env:
        return env if os.path.exists(env) else None
    for candidate in (_LIB_PATH, _PACKAGED_LIB_PATH):
        if os.path.exists(candidate):
            return candidate
    return _build_lib()


def load_native_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    path = _find_lib()
    if not path:
        return None
    lib = ctypes.CDLL(path)
    lib.cstpack_open.restype = ctypes.c_void_p
    lib.cstpack_open.argtypes = [ctypes.c_char_p]
    lib.cstpack_num_videos.restype = ctypes.c_int
    lib.cstpack_num_videos.argtypes = [ctypes.c_void_p]
    lib.cstpack_meta.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.cstpack_read_batch.restype = ctypes.c_int
    lib.cstpack_read_batch.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int,
    ]
    lib.cstpack_close.argtypes = [ctypes.c_void_p]
    if hasattr(lib, "cstp_decode_blobs"):  # added after round 2; stale .so
        lib.cstp_decode_blobs.restype = ctypes.c_int
        lib.cstp_decode_blobs.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int,
        ]
    _lib = lib
    return lib


_decode_path_announced = False


def _announce_decode_path(native: bool) -> None:
    """Log ONCE which JPEG decode path is live: the native pool and PIL both
    wrap libjpeg but their resize filters differ slightly, so inputs are not
    bitwise identical across hosts with/without the compiled .so. Set
    ``CSTP_FORCE_PIL_DECODE=1`` to pin the PIL path when bit-reproducible
    ingest across heterogeneous hosts matters more than decode throughput."""
    global _decode_path_announced
    if _decode_path_announced:
        return
    _decode_path_announced = True
    import logging

    logging.getLogger("cstp_tpu.data").info(
        "JPEG decode path: %s (CSTP_FORCE_PIL_DECODE=1 forces PIL)",
        "native cstp_decode_blobs pool" if native else "PIL",
    )


def decode_jpeg_blobs(blobs: Sequence[bytes], out_hw: Tuple[int, int],
                      n_threads: int = 4) -> Optional[np.ndarray]:
    """Decode+resize independent JPEG byte blobs -> (n, H, W, 3) u8 via the
    native libjpeg pool (serves the reference-LMDB msgpack'd-JPEG path and
    frame-dir ingest). Returns None when the native library is unavailable,
    lacks the entry point, or ``CSTP_FORCE_PIL_DECODE=1`` (callers fall back
    to PIL); failed blobs are zero-filled with a warning, matching
    ``read_clips`` fault semantics. The active path is logged once."""
    if os.environ.get("CSTP_FORCE_PIL_DECODE", "") == "1":
        _announce_decode_path(native=False)
        return None
    lib = load_native_lib()
    if lib is None or not hasattr(lib, "cstp_decode_blobs"):
        _announce_decode_path(native=False)
        return None
    _announce_decode_path(native=True)
    n = len(blobs)
    h, w = out_hw
    out = np.empty((n, h, w, 3), np.uint8)
    if n == 0:
        return out
    ptrs = (ctypes.c_void_p * n)(
        *[ctypes.cast(ctypes.c_char_p(b), ctypes.c_void_p) for b in blobs])
    lens = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
    errs = lib.cstp_decode_blobs(ptrs, lens, n, h, w, out.reshape(-1),
                                 n_threads)
    if errs:
        import warnings

        warnings.warn(f"{errs} JPEG blob decode errors (zero-filled)")
    return out


class NativePackedDataset:
    """CSTPack dataset backed by the C++ reader. Implements the standard
    protocol plus a batched ``read_clips`` fast path used by the loaders."""

    def __init__(self, path: str, ingest_hw: Tuple[int, int] = (128, 171),
                 n_threads: int = 8):
        lib = load_native_lib()
        if lib is None:
            raise RuntimeError("native cstpack library unavailable")
        self._lib = lib
        self._h = lib.cstpack_open(path.encode())
        if not self._h:
            raise FileNotFoundError(f"cannot open CSTPack shard {path!r}")
        self.h0, self.w0 = ingest_hw
        self.n_threads = n_threads
        self._n = lib.cstpack_num_videos(self._h)

    def num_videos(self) -> int:
        return self._n

    def video_meta(self, i: int) -> Tuple[int, int]:
        nf = ctypes.c_int()
        lb = ctypes.c_int()
        self._lib.cstpack_meta(self._h, i, ctypes.byref(nf), ctypes.byref(lb))
        return nf.value, lb.value

    def read_frames(self, i: int, indices: Sequence[int]) -> np.ndarray:
        return self.read_clips(
            np.asarray([i], np.int32),
            np.asarray(indices, np.int32)[None, :],
        )[0]

    def read_clips(self, vids: np.ndarray, indices: np.ndarray) -> np.ndarray:
        """(B,) video ids + (B, L) frame indices -> (B, L, H0, W0, 3) u8,
        decoded and resized by the native thread pool in one call."""
        vids = np.ascontiguousarray(vids, np.int32)
        indices = np.ascontiguousarray(indices, np.int32)
        b, l = indices.shape
        out = np.empty((b, l, self.h0, self.w0, 3), np.uint8)
        errs = self._lib.cstpack_read_batch(
            self._h, vids, indices.reshape(-1), b, l, self.h0, self.w0,
            out.reshape(-1), self.n_threads,
        )
        if errs:
            import warnings

            warnings.warn(f"{errs} frame decode errors (zero-filled)")
        return out

    def close(self):
        if self._h:
            self._lib.cstpack_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
