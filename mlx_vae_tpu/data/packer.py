"""ctypes bridge to the native C++ sequence packer (``native/packer.cpp``).

Always compiled from source on first use with ``g++ -O3`` into a per-user
cache directory (``$XDG_CACHE_HOME/mlx_vae_tpu``); no prebuilt binary is
ever shipped or loaded, so a library built on a different host/ISA can never
be executed here (ADVICE r1). Falls back to a vectorized numpy
implementation when no toolchain is available. Both paths are exercised by
``tests/test_data.py``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SRC = _NATIVE_DIR / "packer.cpp"


def _so_path() -> Path:
    cache = Path(os.environ.get("XDG_CACHE_HOME",
                                Path.home() / ".cache")) / "mlx_vae_tpu"
    return cache / "libpacker.so"


_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    try:
        so = _so_path()
        if not so.exists() or so.stat().st_mtime < _SRC.stat().st_mtime:
            so.parent.mkdir(parents=True, exist_ok=True)
            # Portable ISA flags on purpose: this .so may outlive the host
            # that built it in a copied cache dir, and the hot loops are
            # memcpy-bound anyway (-march=native buys nothing measurable).
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(so)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(so))
        lib.pack_sequences.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.gather_rows.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        return lib
    except Exception:
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if not _tried:
        _tried = True
        if os.environ.get("MLX_VAE_TPU_NO_NATIVE"):
            _lib = None
        else:
            _lib = _build()
    return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def pack_sequences_numpy(sequences: list, max_length: int, pad_token: int) -> np.ndarray:
    out = np.full((len(sequences), max_length), pad_token, dtype=np.int32)
    for i, seq in enumerate(sequences):
        n = min(len(seq), max_length)
        out[i, :n] = seq[:n]
    return out


def pack_sequences(sequences: list, max_length: int, pad_token: int) -> np.ndarray:
    """Ragged list of token lists -> ``[N, max_length] int32`` padded matrix."""
    lib = _get_lib()
    if lib is None or len(sequences) == 0:
        return pack_sequences_numpy(sequences, max_length, pad_token)
    lengths = np.fromiter((len(s) for s in sequences), dtype=np.int64, count=len(sequences))
    offsets = np.zeros(len(sequences) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    flat = np.empty(int(offsets[-1]), dtype=np.int32)
    pos = 0
    for s in sequences:  # concatenation itself is memcpy-bound
        flat[pos : pos + len(s)] = s
        pos += len(s)
    out = np.empty((len(sequences), max_length), dtype=np.int32)
    lib.pack_sequences(
        _ptr(flat, ctypes.c_int32), _ptr(offsets, ctypes.c_int64),
        len(sequences), max_length, pad_token,
        _ptr(out, ctypes.c_int32),
    )
    return out


def gather_rows(data: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Contiguous row-gather ``data[indices]`` via the native library."""
    lib = _get_lib()
    if lib is None or data.dtype != np.int32 or not data.flags.c_contiguous:
        return np.ascontiguousarray(data[indices])
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    out = np.empty((len(idx), data.shape[1]), dtype=np.int32)
    lib.gather_rows(
        _ptr(data, ctypes.c_int32), _ptr(idx, ctypes.c_int64),
        len(idx), data.shape[1], _ptr(out, ctypes.c_int32),
    )
    return out
