"""ctypes wrapper for the native C++ host data-loader.

Compiles data/native/loader.cc on first use (g++, cached next to the
source), then drives it through the C ABI.  Falls back cleanly when no
compiler is available — the pure-Python TrainPipeline covers the same
contract.  The native path exists for the host-side hot loop the
reference solves with 16 torch dataloader workers per GPU (SURVEY §7
"input pipeline throughput"): wav decode + chunking runs in C++ threads,
Python only hands fixed-shape numpy arrays to the device.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, List, Optional, Tuple

import numpy as np

__all__ = [
    "DeterministicNativeLoader",
    "DeterministicNativeShardLoader",
    "NativeLoader",
    "native_available",
    "native_zstd_available",
    "decode_wav_native",
    "decode_wav_native_sr",
]

_LIB = None
_SRC = os.path.join(os.path.dirname(__file__), "native", "loader.cc")
_SO = os.path.join(os.path.dirname(__file__), "native", "libloader.so")


_BUILD_LOCK = threading.Lock()


def _build() -> Optional[str]:
    with _BUILD_LOCK:
        if (os.path.exists(_SO)
                and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
            return _SO
        # compile to a temp path + atomic rename: concurrent processes
        # (multi-rank launch on one host) must never dlopen a half-written
        # .so.  Try with libzstd first (zstd shard streaming); retry
        # without when the dev package is absent.
        tmp = _SO + f".tmp.{os.getpid()}"
        base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                _SRC, "-o", tmp, "-lz"]
        for extra in (["-DWESP_HAVE_ZSTD", "-lzstd"], []):
            try:
                subprocess.run(base + extra, check=True, capture_output=True)
                os.replace(tmp, _SO)
                return _SO
            except (OSError, subprocess.CalledProcessError):
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
        return None


def _lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint, ctypes.c_int, ctypes.c_int,
    ]
    lib.loader_start_epoch.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.decode_wav.restype = ctypes.c_int
    lib.decode_wav.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int
    ]
    lib.decode_wav_sr.restype = ctypes.c_int
    lib.decode_wav_sr.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.loader2_create.restype = ctypes.c_void_p
    lib.loader2_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.loader2_start_epoch.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.loader2_next.restype = ctypes.c_int
    lib.loader2_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.loader2_destroy.argtypes = [ctypes.c_void_p]
    lib.loader2_failures.restype = ctypes.c_long
    lib.loader2_failures.argtypes = [ctypes.c_void_p]
    lib.loader3_create.restype = ctypes.c_void_p
    lib.loader3_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.loader3_start_epoch.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.loader3_next.restype = ctypes.c_int
    lib.loader3_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.loader3_failures.restype = ctypes.c_long
    lib.loader3_failures.argtypes = [ctypes.c_void_p]
    lib.loader3_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _lib() is not None


def native_zstd_available() -> bool:
    """True when the compiled .so streams zstd tar shards natively."""
    lib = _lib()
    if lib is None:
        return False
    try:
        return bool(lib.loader_zstd_supported())
    except AttributeError:  # stale .so from a pre-zstd build
        return False


def decode_wav_native(path: str, max_samples: int = 16000 * 600) -> np.ndarray:
    lib = _lib()
    assert lib is not None, "native loader unavailable"
    buf = np.zeros(max_samples, np.float32)
    n = lib.decode_wav(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples,
    )
    if n < 0:
        raise IOError(f"failed to decode {path}")
    return buf[: min(n, max_samples)].copy()


def decode_wav_native_sr(
    path: str, max_samples: int = 16000 * 120
) -> Tuple[np.ndarray, int]:
    """(mono float32 [-1,1], sample_rate) via the C decoder.  The ctypes
    call releases the GIL, so concurrent decode threads scale — this is
    the raw-list pipeline's fast path (wav_io.read_wav is the fallback).

    Files longer than max_samples are decoded in full via a second call
    with an exact-size buffer — NEVER silently truncated."""
    lib = _lib()
    assert lib is not None, "native loader unavailable"
    buf = np.empty(max_samples, np.float32)
    sr = ctypes.c_int32(0)
    n = lib.decode_wav_sr(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples, ctypes.byref(sr),
    )
    if n < 0:
        raise IOError(f"failed to decode {path}")
    if n > max_samples:  # rare long file: re-decode at exact size
        buf = np.empty(n, np.float32)
        n = lib.decode_wav_sr(
            path.encode(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, ctypes.byref(sr),
        )
        if n < 0:
            raise IOError(f"failed to decode {path}")
    return buf[:n].copy(), int(sr.value)


class DeterministicNativeLoader:
    """Deterministic multi-threaded (wav, label, speed_idx) batches.

    C++ v2 loader: reorder-window emission makes batch composition a pure
    function of (seed, epoch, rank, world) for ANY thread count — the
    property that keeps step-exact mid-epoch resume valid with a parallel
    host loader.  num_spks > 0 enables the speed-perturb draw and x3
    label-space expansion in C++ (reference processor.py:263-286)."""

    def __init__(
        self,
        paths: List[str],
        labels: List[int],
        chunk_samples: int,
        batch_size: int,
        num_spks: int = 0,
        min_samples: int = 16000,
        max_samples: int = 0,
        seed: int = 42,
        num_threads: int = 8,
        window: int = 0,
        rank: int = 0,
        world_size: int = 1,
    ):
        lib = _lib()
        assert lib is not None, "native loader unavailable (no g++?)"
        self._lib = lib
        self.batch_size = batch_size
        self.chunk_samples = chunk_samples
        self.speed = num_spks > 0
        self._paths_keepalive = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(paths))(*self._paths_keepalive)
        lab = np.ascontiguousarray(labels, np.int32)
        self._h = lib.loader2_create(
            arr, lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(paths), num_spks, chunk_samples, batch_size, min_samples,
            max_samples, seed, num_threads, window, rank, world_size,
        )

    def epoch(
        self, epoch: int
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        self._lib.loader2_start_epoch(self._h, epoch)
        while True:
            wav = np.empty((self.batch_size, self.chunk_samples), np.float32)
            label = np.empty((self.batch_size,), np.int32)
            speed = np.zeros((self.batch_size,), np.int32)
            n = self._lib.loader2_next(
                self._h,
                wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                label.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                speed.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            if n < self.batch_size:
                break  # drop last partial batch (training semantics)
            yield wav, label, speed

    def decode_failures(self) -> int:
        """Count of wavs the C parser could not decode (formats the
        python reader may support, e.g. 8-bit PCM) — callers should warn
        when nonzero so data loss is never silent."""
        return int(self._lib.loader2_failures(self._h))

    def close(self):
        if self._h:
            self._lib.loader2_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class DeterministicNativeShardLoader:
    """Deterministic multi-threaded (wav, label, speed_idx) batches from
    webdataset-style TAR SHARDS (reference tools/make_shard_list.py).

    C++ v3 loader (data/native/loader.cc Loader3): shards stripe across
    worker threads; each worker streams tar entries, applies the
    filter/chunk/speed policy + a bounded-buffer shuffle, and assembles
    full batches; batches emit round-robin over workers — deterministic
    for any thread timing.  Plain and gzip tars (zlib gz* stream)."""

    def __init__(
        self,
        shards: List[str],
        spk2id: dict,
        chunk_samples: int,
        batch_size: int,
        num_spks: int = 0,
        min_samples: int = 16000,
        max_samples: int = 0,
        shuffle_size: int = 2500,
        seed: int = 42,
        num_threads: int = 8,
        rank: int = 0,
        world_size: int = 1,
    ):
        lib = _lib()
        assert lib is not None, "native loader unavailable (no g++?)"
        self._lib = lib
        self.batch_size = batch_size
        self.chunk_samples = chunk_samples
        self._shards_keepalive = [s.encode() for s in shards]
        arr = (ctypes.c_char_p * len(shards))(*self._shards_keepalive)
        names = sorted(spk2id)
        self._names_keepalive = [n.encode() for n in names]
        narr = (ctypes.c_char_p * len(names))(*self._names_keepalive)
        ids = np.ascontiguousarray([spk2id[n] for n in names], np.int32)
        self._h = lib.loader3_create(
            arr, len(shards), narr,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(names),
            num_spks, chunk_samples, batch_size, min_samples, max_samples,
            shuffle_size, seed, num_threads, rank, world_size,
        )

    def epoch(
        self, epoch: int
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        self._lib.loader3_start_epoch(self._h, epoch)
        while True:
            wav = np.empty((self.batch_size, self.chunk_samples), np.float32)
            label = np.empty((self.batch_size,), np.int32)
            speed = np.zeros((self.batch_size,), np.int32)
            n = self._lib.loader3_next(
                self._h,
                wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                label.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                speed.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            if n < self.batch_size:
                break
            yield wav, label, speed

    def decode_failures(self) -> int:
        return int(self._lib.loader3_failures(self._h))

    def close(self):
        if self._h:
            self._lib.loader3_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeLoader:
    """Fixed-chunk supervised batches from (path, label) lists."""

    def __init__(
        self,
        paths: List[str],
        labels: List[int],
        chunk_samples: int,
        batch_size: int,
        min_samples: int = 16000,
        seed: int = 42,
        num_threads: int = 8,
    ):
        lib = _lib()
        assert lib is not None, "native loader unavailable (no g++?)"
        self._lib = lib
        self.batch_size = batch_size
        self.chunk_samples = chunk_samples
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths]
        )
        lab = np.asarray(labels, np.int32)
        self._h = lib.loader_create(
            arr, lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(paths), chunk_samples, batch_size, min_samples,
            seed, num_threads, 4 * batch_size,
        )

    def epoch(self, epoch: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        self._lib.loader_start_epoch(self._h, epoch)
        while True:
            wav = np.zeros((self.batch_size, self.chunk_samples), np.float32)
            label = np.zeros((self.batch_size,), np.int32)
            n = self._lib.loader_next(
                self._h,
                wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                label.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            if n < self.batch_size:
                break  # drop last partial batch (training semantics)
            yield wav, label

    def close(self):
        if self._h:
            self._lib.loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
