"""ctypes bindings for the native wav decoder (csrc/wavio.cpp).

Loads audiogan_tpu/data/_libagwav.so if present (build with
`make -C csrc` or scripts/build_native.sh); everything degrades to the
pure-numpy codec when the library is missing or a format is unsupported, so
the native tier is a pure accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).parent / "_libagwav.so"
_lib = None


def load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.ag_decode_wav_to_store.restype = ctypes.c_int64
        lib.ag_decode_wav_to_store.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.ag_abi_version.restype = ctypes.c_int32
        if lib.ag_abi_version() != 1:
            return None
        try:  # batcher entry points (csrc/batcher.cpp); older .so lacks them
            lib.ag_batcher_abi_version.restype = ctypes.c_int32
            lib.ag_gather_rows.restype = ctypes.c_int64
            lib.ag_gather_rows.argtypes = [
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int32]
            lib._ag_has_batcher = lib.ag_batcher_abi_version() == 1
        except AttributeError:
            lib._ag_has_batcher = False
        _lib = lib
        return lib
    except OSError:
        return None


def available() -> bool:
    return load() is not None


def decode_to_store(data: bytes, store_len: int
                    ) -> tuple[int, np.ndarray] | None:
    """Decode wav bytes -> (rate, int16 [store_len]) via the native lib.

    Returns None when the lib is absent or the format is unsupported
    (caller falls back to the numpy codec).
    """
    lib = load()
    if lib is None:
        return None
    out = np.zeros(store_len, dtype=np.int16)
    rate = ctypes.c_int32(0)
    n = lib.ag_decode_wav_to_store(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        store_len, ctypes.byref(rate))
    if n < 0:
        return None
    return int(rate.value), out


def gather_rows(clips: np.ndarray, idx: np.ndarray,
                n_threads: int = 0) -> np.ndarray | None:
    """Native batch gather: rows of the int16 clip store selected by idx.

    clips is the [N, store_len] int16 memmap; idx any integer array — the
    result has shape idx.shape + (store_len,), byte-identical to
    ``clips[idx]`` (pinned by tests/data/test_native.py). Returns None when
    the lib is absent or predates the batcher ABI (caller falls back to
    numpy fancy indexing).
    """
    lib = load()
    if lib is None or not lib._ag_has_batcher:
        return None
    assert (clips.dtype == np.int16 and clips.ndim == 2
            and clips.flags["C_CONTIGUOUS"])
    flat = np.ascontiguousarray(idx, dtype=np.int64).reshape(-1)
    out = np.empty((flat.size, clips.shape[1]), dtype=np.int16)
    n = lib.ag_gather_rows(
        clips.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        clips.shape[0], clips.shape[1],
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), flat.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), n_threads)
    if n != flat.size:
        raise ValueError(f"native gather failed (rc={n}): index out of "
                         f"range for corpus of {clips.shape[0]} clips")
    return out.reshape(*idx.shape, clips.shape[1])
