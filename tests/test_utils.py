"""Direct unit tests for the small host-side utilities.

``utils/prefetch.py`` and ``utils/profiler.py`` are exercised indirectly by
every trainer test (the host-feed path prefetches, bench.py uses StepTimer);
these pin their contracts directly so a regression is localized here instead
of surfacing as an opaque trainer failure.
"""

import time

import jax
import numpy as np
import pytest

from mlx_vae_tpu.utils.prefetch import prefetch_to_device
from mlx_vae_tpu.utils.profiler import StepTimer, debug_nans, trace


class TestPrefetch:
    def test_order_preserved(self):
        items = [np.full((2,), i, np.int32) for i in range(7)]
        out = list(prefetch_to_device(iter(items), size=2))
        assert len(out) == 7
        for i, x in enumerate(out):
            np.testing.assert_array_equal(np.asarray(x), items[i])

    def test_tuple_items_keep_structure(self):
        items = [(np.arange(3), np.float32(i)) for i in range(4)]
        out = list(prefetch_to_device(iter(items), size=2))
        assert all(isinstance(o, tuple) and len(o) == 2 for o in out)
        np.testing.assert_array_equal(np.asarray(out[3][0]), np.arange(3))
        assert float(out[3][1]) == 3.0

    def test_yields_device_arrays(self):
        (out,) = list(prefetch_to_device(iter([np.zeros(4)]), size=2))
        assert isinstance(out, jax.Array)

    def test_iterator_shorter_than_lookahead(self):
        # fewer items than the queue depth must not drop or duplicate any
        out = list(prefetch_to_device(iter([np.int32(1)]), size=4))
        assert [int(x) for x in out] == [1]

    def test_empty_iterator(self):
        assert list(prefetch_to_device(iter([]), size=2)) == []

    def test_lookahead_is_bounded(self):
        # the queue must pull at most `size` items ahead of the consumer —
        # unbounded pull would upload a whole epoch of batches to HBM
        pulled = []

        def gen():
            for i in range(6):
                pulled.append(i)
                yield np.int32(i)

        it = prefetch_to_device(gen(), size=2)
        assert pulled == []          # lazy until first next()
        next(it)
        assert len(pulled) == 3      # size ahead + the one consumed


class TestStepTimer:
    def test_warmup_steps_excluded(self):
        t = StepTimer(warmup=3)
        for _ in range(3):
            t.tick(1_000_000)        # warmup: must not count
        assert t.tokens == 0
        t.tick(500)
        t.tick(500)
        assert t.tokens == 1000
        assert t.tokens_per_sec > 0

    def test_zero_before_warmup_complete(self):
        t = StepTimer(warmup=5)
        t.tick(100)
        assert t.tokens_per_sec == 0.0

    def test_rate_magnitude(self):
        t = StepTimer(warmup=1)
        t.tick(0)
        start = time.perf_counter()
        t.tick(1000)
        elapsed = time.perf_counter() - start
        rate = t.tokens_per_sec
        # 1000 tokens over ~elapsed seconds, generous bounds
        assert rate <= 1000 / max(elapsed, 1e-9) * 1.01
        assert rate > 0


class TestProfiler:
    def test_trace_none_is_noop(self):
        with trace(None):
            pass  # must not start a profiler session

    @pytest.mark.slow  # ~80s: profiler start/stop + trace dump dominate
    def test_trace_writes_artifacts(self, tmp_path):
        logdir = str(tmp_path / "trace")
        try:
            with trace(logdir):
                jax.block_until_ready(jax.numpy.ones(8) * 2)
        except Exception as e:  # profiler backend unavailable in sandbox
            pytest.skip(f"jax.profiler unavailable: {e}")
        assert any((tmp_path / "trace").rglob("*"))

    def test_debug_nans_toggle(self):
        orig = jax.config.jax_debug_nans
        try:
            debug_nans(True)
            assert jax.config.jax_debug_nans is True
            with pytest.raises(FloatingPointError):
                jax.jit(lambda x: x / 0.0)(jax.numpy.float32(0.0))
            debug_nans(False)
            assert jax.config.jax_debug_nans is False
        finally:
            jax.config.update("jax_debug_nans", orig)


class TestCompilationCache:
    """The persistent-cache plumbing (``utils/compile_cache.py``).

    Numerics are cache-invariant by construction (the cache stores the exact
    executable XLA would have produced), so these pin only the plumbing: the
    config is set, entries land on disk, the flags control it, and failure
    to create the directory degrades to a warning instead of an error.
    """

    def _restore(self):
        import jax
        jax.config.update("jax_compilation_cache_dir", None)

    def test_enable_sets_config_and_writes_entries(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from mlx_vae_tpu.utils.compile_cache import enable_compilation_cache
        d = tmp_path / "cache"
        try:
            assert enable_compilation_cache(str(d)) == str(d)
            assert jax.config.jax_compilation_cache_dir == str(d)
            # CPU compiles are sub-second; drop the time floor so this
            # tiny program actually produces an entry.
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
            jax.block_until_ready(
                jax.jit(lambda x: jnp.tanh(x) * 41.0 + x)(jnp.arange(13.0)))
            assert any(d.iterdir()), "no cache entry written"
        finally:
            self._restore()

    def test_flags_roundtrip(self, tmp_path):
        import argparse
        from mlx_vae_tpu.utils.compile_cache import (
            add_cache_flags, setup_cache_from_args)
        p = argparse.ArgumentParser()
        add_cache_flags(p)
        try:
            args = p.parse_args(["--no_compilation_cache"])
            assert setup_cache_from_args(args) is None
            d = tmp_path / "c2"
            args = p.parse_args(["--compilation_cache", str(d)])
            assert setup_cache_from_args(args) == str(d)
            assert d.is_dir()
        finally:
            self._restore()

    def test_unwritable_dir_degrades_to_warning(self, tmp_path, capsys):
        from mlx_vae_tpu.utils.compile_cache import enable_compilation_cache
        blocker = tmp_path / "file"
        blocker.write_text("not a directory")
        try:
            assert enable_compilation_cache(str(blocker / "sub")) is None
            assert "compilation cache disabled" in capsys.readouterr().out
        finally:
            self._restore()

    def test_every_cli_exposes_the_flags(self):
        """All six CLIs carry the cache flags (they all jit programs whose
        remote compiles the cache exists to skip)."""
        import importlib
        for mod in ("train", "generate", "encode", "interpolate",
                    "optimize", "serve"):
            parser = importlib.import_module(
                f"mlx_vae_tpu.cli.{mod}").build_parser()
            opts = {a.dest for a in parser._actions}
            assert {"compilation_cache", "no_compilation_cache"} <= opts, mod
