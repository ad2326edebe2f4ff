"""Shared loader for the native C++ runtime components (``native/*.cpp``).

Each component is always compiled from source on first use with ``g++ -O3``
into a per-user cache directory (``$XDG_CACHE_HOME/mlx_vae_tpu``); no
prebuilt binary is ever shipped or loaded, so a library built on a different
host/ISA can never be executed here (ADVICE r1). Callers fall back to their
pure numpy/Python implementations when no toolchain is available — both
paths are test-covered. Set ``MLX_VAE_TPU_NO_NATIVE=1`` to force the
fallbacks (used by the parity tests).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from pathlib import Path
from typing import Callable, Dict, Optional

NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"

# source path -> (loaded lib or None); miss means not yet attempted.
_cache: Dict[str, Optional[ctypes.CDLL]] = {}


def _so_path(src: Path) -> Path:
    cache = Path(os.environ.get("XDG_CACHE_HOME",
                                Path.home() / ".cache")) / "mlx_vae_tpu"
    return cache / f"lib{src.stem}.so"


def load_native(src: Path,
                configure: Callable[[ctypes.CDLL], None]) -> Optional[ctypes.CDLL]:
    """Compile (if stale) and load ``src``; ``configure`` sets argtypes.

    Returns None — permanently for this process — on any failure (no g++,
    read-only cache dir, compile error) or when ``MLX_VAE_TPU_NO_NATIVE``
    is set, so hot paths can branch to their Python fallbacks without
    re-probing per call.
    """
    key = str(src)
    if key in _cache:
        return _cache[key]
    lib: Optional[ctypes.CDLL] = None
    if not os.environ.get("MLX_VAE_TPU_NO_NATIVE"):
        try:
            so = _so_path(src)
            if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
                so.parent.mkdir(parents=True, exist_ok=True)
                # Portable ISA flags on purpose: this .so may outlive the
                # host that built it in a copied cache dir, and the hot
                # loops are memory-bound (-march=native buys nothing
                # measurable).
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", str(src),
                     "-o", str(so)],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(str(so))
            configure(lib)
        except Exception as e:
            # The fallback must stay non-fatal, but a broken toolchain
            # silently dropping bulk post-processing to the ~10x-slower
            # Python paths deserves one visible signal (ADVICE r3).
            detail = ""
            if isinstance(e, subprocess.CalledProcessError) and e.stderr:
                stderr = e.stderr.decode(errors="replace").strip()
                detail = f"\n  g++ stderr: {stderr[:500]}"
            print(f"mlx_vae_tpu: native component {src.name} unavailable "
                  f"({type(e).__name__}: {e}); using the slower Python "
                  f"fallback for this process.{detail}", file=sys.stderr)
            lib = None
    _cache[key] = lib
    return lib


def ptr(a, ctype):
    """ctypes pointer to a (contiguous) numpy array's buffer."""
    return a.ctypes.data_as(ctypes.POINTER(ctype))
