"""Persistent XLA compilation cache.

The reference never compiles anything (MLX is eager/lazy on-device), so cold
starts are free there; here every jitted program costs a real XLA:TPU compile
— 60–120s per program through a remote backend, ~5 minutes for the first
training epoch (train step + eval variants + generation). JAX's persistent
compilation cache keys compiled executables by the hash of the HLO +
compile options + backend, so a second run of the same CLI (or the same jit
shapes from a different CLI) skips straight to execution.

This is infrastructure the reference cannot express; it changes nothing
numerically (the cache stores the exact executable XLA would have produced)
and is therefore on by default for every CLI, with ``--no_compilation_cache``
to opt out and ``--compilation_cache DIR`` to relocate it.
"""

from __future__ import annotations

import os
from pathlib import Path

DEFAULT_CACHE_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "mlx_vae_tpu", "jax_cache")

# Programs cheaper than this to compile are not worth a disk entry (the CPU
# test tier compiles hundreds of sub-second programs; caching them would only
# churn the directory).
_MIN_COMPILE_SECS = 2.0


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache; returns the directory.

    Safe to call more than once (last directory wins) and safe to call after
    jax has already compiled programs in this process: jax initializes the
    persistent cache at most once and then pins that decision, so merely
    setting ``jax_compilation_cache_dir`` after a first compile is a silent
    no-op — we therefore also reset the cache module's init state so the
    next compile re-reads the config. Returns None (disabled) if the
    directory cannot be created, e.g. a read-only home on a locked-down
    deployment: a cold compile is slow but correct, so cache failure must
    never be fatal.
    """
    import jax

    path = Path(cache_dir or DEFAULT_CACHE_DIR)
    try:
        path.mkdir(parents=True, exist_ok=True)
    except OSError as e:  # pragma: no cover - depends on host FS permissions
        print(f"WARNING: compilation cache disabled ({e})")
        return None
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      _MIN_COMPILE_SECS)
    # Cache entries regardless of size; the executables here are small
    # (a few MB) and the directory is user-scoped.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    try:
        from jax._src import compilation_cache as _cc
        _cc.reset_cache()
    except Exception:  # pragma: no cover - private API moved/renamed
        pass  # first-compile-before-enable then stays uncached; not fatal
    return str(path)


def add_cache_flags(parser) -> None:
    """Attach the shared cache flags to an argparse parser."""
    parser.add_argument(
        "--compilation_cache", type=str, default=None, metavar="DIR",
        help="Persistent XLA compilation cache directory "
             f"(default: {DEFAULT_CACHE_DIR})")
    parser.add_argument(
        "--no_compilation_cache", action="store_true",
        help="Disable the persistent compilation cache")


def setup_cache_from_args(args) -> str | None:
    """Honor the flags added by :func:`add_cache_flags`."""
    if getattr(args, "no_compilation_cache", False):
        return None
    return enable_compilation_cache(getattr(args, "compilation_cache", None))
