"""ctypes binding for the native libav decoder (native/videodecode).

LibavVideoReader is the production raw-video Reader: exact
[start, end]-second range decode to RGB24 uint8 frames + fps/duration
probing, replacing the torchvision video_reader backend + OpenCV probe of
the reference (reader_fns.py:20-31, common/utils.py:193-208). Builds the
shared library on first use if g++/libav are present; callers can fall
back to OpenCVVideoReader otherwise.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from avt_tpu.data.readers import Reader

LOG = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native" / "videodecode"
_LIB_PATH = _NATIVE_DIR / "libvideodecode.so"
_lib = None
_lib_lock = threading.Lock()


def _load_lib():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not _LIB_PATH.exists():
            LOG.info("Building native video decoder at %s", _NATIVE_DIR)
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.vd_open.restype = ctypes.c_void_p
        lib.vd_open.argtypes = [ctypes.c_char_p]
        lib.vd_close.argtypes = [ctypes.c_void_p]
        lib.vd_fps.restype = ctypes.c_double
        lib.vd_fps.argtypes = [ctypes.c_void_p]
        lib.vd_duration.restype = ctypes.c_double
        lib.vd_duration.argtypes = [ctypes.c_void_p]
        lib.vd_width.restype = ctypes.c_int
        lib.vd_width.argtypes = [ctypes.c_void_p]
        lib.vd_height.restype = ctypes.c_int
        lib.vd_height.argtypes = [ctypes.c_void_p]
        lib.vd_read_range.restype = ctypes.c_int
        lib.vd_read_range.argtypes = [
            ctypes.c_void_p, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
        ]
        lib.vd_last_error.restype = ctypes.c_char_p
        lib.vd_remux.restype = ctypes.c_int
        lib.vd_remux.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_double,
            ctypes.c_double, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def have_native_decoder() -> bool:
    try:
        _load_lib()
        return True
    except Exception as err:  # missing toolchain/libav
        LOG.warning("native decoder unavailable: %s", err)
        return False


class _Handle:
    """RAII wrapper for one open video."""

    def __init__(self, path: str):
        self.lib = _load_lib()
        self.ptr = self.lib.vd_open(str(path).encode())
        # decode state (seek position, codec buffers) is per-handle; a lock
        # serializes loader threads sharing a cached handle
        self.lock = threading.Lock()
        if not self.ptr:
            raise IOError(
                f"decoder open failed for {path}: "
                f"{self.lib.vd_last_error().decode()}"
            )

    def __del__(self):
        if getattr(self, "ptr", None):
            self.lib.vd_close(self.ptr)
            self.ptr = None

    @property
    def fps(self) -> float:
        return self.lib.vd_fps(self.ptr)

    @property
    def duration(self) -> float:
        return self.lib.vd_duration(self.ptr)

    @property
    def shape(self) -> Tuple[int, int]:
        return self.lib.vd_height(self.ptr), self.lib.vd_width(self.ptr)

    def read_range(self, start: float, end: float, max_frames: Optional[int] = None):
        h, w = self.shape
        if max_frames is None:
            max_frames = int((end - start) * max(self.fps, 1.0)) + 8
        out = np.empty((max_frames, h, w, 3), dtype=np.uint8)
        pts = np.empty((max_frames,), dtype=np.float64)
        with self.lock:
            n = self.lib.vd_read_range(
                self.ptr, float(start), float(end),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                max_frames,
            )
        if n < 0:
            raise IOError(self.lib.vd_last_error().decode())
        return out[:n], pts[:n]


def get_video_info(path) -> Dict[str, float]:
    """fps/len probe (common/utils.py get_video_info parity)."""
    h = _Handle(path)
    return {"fps": h.fps, "len": h.duration}


def remux(
    in_path, out_path, *,
    pts_scale: float = 1.0, pts_quad: float = 0.0, rotation_deg: int = 0,
) -> None:
    """Stream-copy remux with transformed timestamps / rotation metadata.

    new_pts_sec = sec * pts_scale + pts_quad * sec^2 — emulates VFR
    sources (pts != frame_idx/fps) and rotated captures without needing
    an encoder. Also useful for re-timing datasets offline.
    """
    lib = _load_lib()
    rc = lib.vd_remux(
        str(in_path).encode(), str(out_path).encode(),
        float(pts_scale), float(pts_quad), int(rotation_deg),
    )
    if rc != 0:
        raise IOError(lib.vd_last_error().decode())


class _HandlePool:
    """Per-path pool of decoder handles.

    Anticipation datasets read MANY clips from the SAME video file (EK100
    has hundreds of actions per kitchen video), so loader threads pile onto
    one path. A single cached handle would serialize them on its decode
    lock — the pool hands each concurrent reader its own AVFormatContext
    (decoders scale across cores; the GIL is released inside the ctypes
    call) and recycles contexts afterwards to amortize open/probe cost.
    """

    def __init__(self, max_per_path: int = 8, max_total: int = 64):
        self._free: Dict[str, list] = {}
        self._lock = threading.Lock()
        self._max = max_per_path
        self._max_total = max_total
        self._total = 0

    def acquire(self, path: str) -> _Handle:
        with self._lock:
            free = self._free.get(path)
            if free:
                self._total -= 1
                return free.pop()
        return _Handle(path)

    def release(self, path: str, handle: _Handle) -> None:
        """Return a HEALTHY handle for reuse (callers drop handles whose
        read just raised — a failed decode can leave the context mid-stream).

        An open AVFormatContext holds an fd + codec buffers, so the pool is
        bounded per path AND globally; over the global cap the oldest idle
        path's handles evict first (loaders sweep datasets video-by-video,
        so stale paths stop being touched)."""
        with self._lock:
            free = self._free.setdefault(path, [])
            if len(free) >= self._max:
                return  # over per-path capacity: drop (closes via __del__)
            free.append(handle)
            self._total += 1
            while self._total > self._max_total:
                # evict from the least-recently-inserted other path
                for other, lst in self._free.items():
                    if lst and other != path:
                        lst.pop(0)
                        self._total -= 1
                        break
                else:
                    free.pop(0)  # only this path has handles
                    self._total -= 1


class LibavVideoReader(Reader):
    """Raw-video reader over the native decoder (pooled handles)."""

    def __init__(self, cache_handles: bool = True, max_pool_per_path: int = 8):
        _load_lib()
        self.cache_handles = cache_handles
        self._pool = _HandlePool(max_pool_per_path if cache_handles else 0)

    def get_frame_rate(self, video_path) -> float:
        key = str(video_path)
        try:
            h = self._pool.acquire(key)
        except IOError:
            return 0.0  # empty-clip path downstream
        fps = h.fps
        self._pool.release(key, h)
        return fps

    def __call__(self, video_path, start_sec, end_sec, fps, row):
        key = str(video_path)
        try:
            handle = self._pool.acquire(key)
        except IOError:
            return np.zeros((0, 1, 1, 3), dtype=np.uint8), {}
        # only HEALTHY handles return to the pool: a raised read may leave
        # the demux/codec state mid-stream, so the handle is dropped (its
        # __del__ closes the context) and the error propagates to the
        # loader's None-backfill path
        frames, pts = handle.read_range(start_sec, end_sec)
        out = frames, {"video_fps": handle.fps}
        self._pool.release(key, handle)
        return out
