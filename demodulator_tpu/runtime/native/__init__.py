"""ctypes binding for the native block-IO runtime (blockio.cpp).

Builds ``libblockio.so`` on demand with g++ (cached beside the source; no
pybind11 in this environment) and exposes ``NativeBlockReader`` with the
same iterator contract as runtime.stream.BlockReader.  If no C++ toolchain
is available the import still succeeds and ``available()`` returns False —
callers fall back to the pure-Python reader.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "blockio.cpp")
_LIB = os.path.join(_DIR, "libblockio.so")

_lib: Optional[ctypes.CDLL] = None
_lock = threading.Lock()


def _build() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            try:
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-pthread",
                     "-o", _LIB, _SRC],
                    check=True, capture_output=True)
            except (OSError, subprocess.CalledProcessError):
                return None
        lib = ctypes.CDLL(_LIB)
        lib.bio_open.restype = ctypes.c_void_p
        lib.bio_open.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                 ctypes.c_int, ctypes.c_int, ctypes.c_long]
        lib.bio_next.restype = ctypes.c_long
        lib.bio_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.bio_close.restype = None
        lib.bio_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def available() -> bool:
    return _build() is not None


class NativeBlockReader:
    """Iterator of full uint8 blocks from a file path (or '-' for stdin),
    read by the C++ producer thread into a depth-N aligned ring."""

    def __init__(self, path: str, block_size: int, depth: int = 4,
                 tail_policy: str = "drop", offset: int = 0):
        lib = _build()
        if lib is None:
            raise RuntimeError("native blockio unavailable (no g++?)")
        self._lib = lib
        self.block_size = block_size
        self._h = lib.bio_open(path.encode(), block_size, depth,
                               1 if tail_policy == "pad" else 0, offset)
        if not self._h:
            raise OSError(f"bio_open failed for {path!r}")
        self.error = None

    def __iter__(self) -> Iterator[np.ndarray]:
        buf = np.empty(self.block_size, dtype=np.uint8)
        while True:
            n = self._lib.bio_next(
                self._h, buf.ctypes.data_as(ctypes.c_void_p))
            if n == self.block_size:
                yield buf.copy()
            elif n == 0:
                return
            else:
                raise IOError(f"native block read failed (code {n})")

    def close(self):
        if self._h:
            self._lib.bio_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
