"""ctypes bindings for the C++ tokenstore data pipeline.

The shared library is built on first use with g++ (cached next to the
source); every entry point has a pure-numpy fallback so the framework works
without a toolchain. The native path serves pre-shifted calibration batches
from a memory-mapped binary token file with a background prefetch thread.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

logger = logging.getLogger("grasp_tpu")

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tokenstore.cc")
_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libgrasp_native.so")
_lib = None
_lib_lock = threading.Lock()


def _build() -> Optional[str]:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=300,
        )
        return _LIB_PATH
    except (OSError, subprocess.SubprocessError) as e:
        logger.warning("native tokenstore build failed (%s); using numpy fallback", e)
        return None


def _get_lib():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib or None
        path = _LIB_PATH if os.path.exists(_LIB_PATH) else _build()
        if path is None:
            _lib = False
            return None
        lib = ctypes.CDLL(path)
        lib.ts_open.restype = ctypes.c_void_p
        lib.ts_open.argtypes = [ctypes.c_char_p]
        lib.ts_len.restype = ctypes.c_int64
        lib.ts_len.argtypes = [ctypes.c_void_p]
        lib.ts_close.argtypes = [ctypes.c_void_p]
        lib.ts_write.restype = ctypes.c_int
        lib.ts_write.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
        lib.bs_create.restype = ctypes.c_void_p
        lib.bs_create.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_int, ctypes.c_int64,
        ]
        lib.bs_num_batches.restype = ctypes.c_int64
        lib.bs_num_batches.argtypes = [ctypes.c_void_p]
        lib.bs_next.restype = ctypes.c_int64
        lib.bs_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)]
        lib.bs_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def native_available() -> bool:
    return _get_lib() is not None


def write_token_file(path: str, tokens: np.ndarray) -> None:
    """Persist a 1-D int token stream as the binary token file format."""
    tokens = np.ascontiguousarray(np.asarray(tokens, dtype=np.int32))
    lib = _get_lib()
    if lib is not None:
        rc = lib.ts_write(
            path.encode(), tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(tokens)
        )
        if rc == 0:
            return
        logger.warning("native ts_write failed rc=%d; falling back to numpy", rc)
    tokens.tofile(path)


class TokenStore:
    """Memory-mapped binary int32 token stream."""

    def __init__(self, path: str):
        self.path = path
        self._lib = _get_lib()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.ts_open(path.encode())
            if not self._handle:
                raise FileNotFoundError(path)
            self._n = int(self._lib.ts_len(self._handle))
        else:
            self._mm = np.memmap(path, dtype=np.int32, mode="r")
            self._n = len(self._mm)

    def __len__(self) -> int:
        return self._n

    def close(self) -> None:
        if self._handle and self._lib is not None:
            self._lib.ts_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class BatchServer:
    """Iterator of pre-shifted calibration batches with native prefetch.

    Yields {"input_ids": [B, seq_len-1], "labels": [B, seq_len-1]} int32,
    exactly the reference loader's chunk+pre-shift semantics
    (dataset/loader.py:33-36, 59-68).
    """

    def __init__(self, store: TokenStore, seq_len: int, batch_size: int,
                 seed: int = 42, shuffle: bool = True, ring_cap: int = 4):
        self.store = store
        self.seq_len = seq_len
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.ring_cap = ring_cap
        self._lib = _get_lib() if store._handle else None

        n_chunks = len(store) // seq_len
        self.num_batches = n_chunks // batch_size
        if self.num_batches == 0:
            raise ValueError(
                f"not enough tokens ({len(store)}) for one batch of "
                f"{batch_size} x {seq_len}"
            )

    def __len__(self) -> int:
        return self.num_batches

    def __iter__(self) -> Iterator[dict]:
        sm1 = self.seq_len - 1
        if self._lib is not None:
            bs = self._lib.bs_create(
                self.store._handle, self.seq_len, self.batch_size,
                self.seed, int(self.shuffle), self.ring_cap,
            )
            if not bs:
                raise RuntimeError("bs_create failed")
            try:
                buf = np.empty((2, self.batch_size, sm1), np.int32)
                while True:
                    idx = self._lib.bs_next(bs, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
                    if idx < 0:
                        break
                    yield {"input_ids": buf[0].copy(), "labels": buf[1].copy()}
            finally:
                self._lib.bs_destroy(bs)
        else:
            mm = self.store._mm
            n_chunks = len(self.store) // self.seq_len
            order = np.arange(n_chunks)
            if self.shuffle:
                # matches the C++ Fisher-Yates stream only in distribution,
                # not bit-for-bit; the native path is the production one
                order = np.random.default_rng(self.seed).permutation(n_chunks)
            for b in range(self.num_batches):
                rows_in = np.empty((self.batch_size, sm1), np.int32)
                rows_lb = np.empty((self.batch_size, sm1), np.int32)
                for j in range(self.batch_size):
                    c = order[b * self.batch_size + j]
                    chunk = np.asarray(mm[c * self.seq_len : (c + 1) * self.seq_len])
                    rows_in[j] = chunk[:-1]
                    rows_lb[j] = chunk[1:]
                yield {"input_ids": rows_in, "labels": rows_lb}
