"""ctypes binding for the native clip-sampling engine.

Compiles ``native/clip_sampler.cpp`` with the system ``g++`` on first use
(cached next to the source) and exposes :class:`NpyWindowStore` — mmap'd
.npy feature files plus a batched window-copy that runs GIL-free on a C++
thread pool. Falls back cleanly: :func:`native_available` is False when no
compiler / unsupported platform, and every consumer keeps a bit-identical
numpy path (tests/test_native.py proves equality).

The reference has no native components (SURVEY.md §2 intro) — its loader is
torch DataLoader worker *processes* (train_cpc.py:93). Worker processes are
the wrong tool under JAX (fork vs. multithreaded runtime); a GIL-free
in-process copy engine gives the same overlap without the fork hazard.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "clip_sampler.cpp"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    so = _SRC.parent / f"_clip_sampler_{sys.implementation.cache_tag}.so"
    if not so.exists() or so.stat().st_mtime < _SRC.stat().st_mtime:
        # Per-process temp name: two processes building concurrently must
        # not interleave compiler output into one file before the atomic
        # rename (a truncated .so would load or replace cleanly and the
        # mtime staleness check would never retrigger).
        tmp = so.with_suffix(f".so.tmp.{os.getpid()}")
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            str(_SRC), "-o", str(tmp), "-lpthread",
        ]
        try:
            subprocess.run(
                cmd, check=True, capture_output=True, timeout=120
            )
        except (OSError, subprocess.SubprocessError):
            return None
        tmp.replace(so)
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None

    lib.cs_open.restype = ctypes.c_void_p
    lib.cs_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32]
    lib.cs_close.argtypes = [ctypes.c_void_p]
    for fn, res in (("cs_rows", ctypes.c_int64), ("cs_cols", ctypes.c_int64),
                    ("cs_esize", ctypes.c_int32)):
        getattr(lib, fn).restype = res
        getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.cs_sample.restype = ctypes.c_int32
    lib.cs_sample.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
        ctypes.c_int64,
        ctypes.c_void_p,
        ctypes.c_int32,
    ]
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _TRIED = True
            _LIB = _build_and_load()
    return _LIB


def native_available() -> bool:
    return _lib() is not None


class NpyWindowStore:
    """mmap'd .npy files + GIL-free batched window sampling.

    All files must share their leading (row) dimension and dtype; windows
    are taken over the trailing (time) axis. ``sample`` returns
    ``(count, rows, clip)`` (squeezed to ``(count, clip)`` for 1-D files).
    """

    def __init__(self, paths: Sequence[Path], dtype: np.dtype, rows: int):
        lib = _lib()
        if lib is None:
            raise RuntimeError(
                "native clip sampler unavailable (no g++?); "
                "check native_available() first"
            )
        self._libref = lib
        self.dtype = np.dtype(dtype)
        self.rows = rows
        arr = (ctypes.c_char_p * len(paths))(
            *[str(p).encode() for p in paths]
        )
        self._h = lib.cs_open(arr, len(paths))
        if not self._h:
            raise ValueError(
                "cs_open failed: unreadable/unsupported .npy among "
                f"{len(paths)} files (need C-order, <=2-D)"
            )
        for i in range(len(paths)):
            if (lib.cs_rows(self._h, i) != rows
                    or lib.cs_esize(self._h, i) != self.dtype.itemsize):
                n_cols = lib.cs_cols(self._h, i)
                lib.cs_close(self._h)
                self._h = None
                raise ValueError(
                    f"file {paths[i]} has rows={rows} mismatch or itemsize "
                    f"!= {self.dtype.itemsize} (cols={n_cols})"
                )
        self.n_files = len(paths)

    def sample(
        self,
        file_ids: np.ndarray,
        starts: np.ndarray,
        clip: int,
        n_threads: int = 4,
    ) -> np.ndarray:
        file_ids = np.ascontiguousarray(file_ids, np.int32)
        starts = np.ascontiguousarray(starts, np.int64)
        count = file_ids.shape[0]
        out = np.empty((count, self.rows, clip), self.dtype)
        rc = self._libref.cs_sample(
            self._h,
            file_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            count,
            clip,
            out.ctypes.data_as(ctypes.c_void_p),
            n_threads,
        )
        if rc != 0:
            i = rc - 1
            raise IndexError(
                f"window out of bounds: request {i} (file {file_ids[i]}, "
                f"start {starts[i]}, clip {clip})"
            )
        return out[:, 0, :] if self.rows == 1 else out

    def close(self) -> None:
        if self._h:
            self._libref.cs_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass
