"""Native generation post-processor (``native/postproc.cpp``) parity.

The numpy/Python implementations in ``data/metrics.py`` and
``data/prepare.py`` are the oracle; the native paths must agree exactly on
randomized token matrices and on the edge rows (immediate EOS, no EOS, all
specials, all pad, empty-molecule duplicates). The fallback behavior (no
native lib) is pinned by monkeypatching the loader, not by relying on
process state.
"""

import numpy as np
import pytest

from mlx_vae_tpu.data import postproc
from mlx_vae_tpu.data.metrics import (_key_set, canonical_tokens, novelty,
                                      uniqueness)
from mlx_vae_tpu.data.prepare import EOS, selfies_validity

native = pytest.mark.skipif(postproc._lib() is None,
                            reason="no native toolchain")


def _random_tokens(rng, n, L, vocab=12):
    """Token matrices biased toward interesting rows: plenty of specials,
    EOS at varied positions, duplicate molecules."""
    a = rng.integers(0, vocab, (n, L)).astype(np.int32)
    # Force duplicates: copy some rows (identity must dedup them).
    if n > 4:
        a[n // 2] = a[0]
        a[n // 2 + 1] = a[1]
    # Edge rows.
    a[0, 0] = EOS                      # immediate EOS -> empty molecule
    if n > 1:
        a[1] = np.where(a[1] == EOS, 3, a[1])  # no EOS anywhere
    if n > 2:
        a[2] = 0                       # all pad (no EOS, no content)
    if n > 3:
        a[3, :] = 1                    # all specials, then EOS
        a[3, -1] = EOS
    return a


def _python_validity(tokens):
    """The prepare.py proxy loop, restated independently."""
    ok = 0
    for row in tokens:
        row = list(map(int, row))
        has_eos = EOS in row
        body = row[: row.index(EOS)] if has_eos else row
        ok += has_eos and any(t > EOS for t in body)
    return ok / len(tokens)


@native
class TestNativeParity:
    @pytest.mark.parametrize("n,L", [(1, 1), (7, 3), (64, 20), (301, 61)])
    def test_canonicalize_matches_numpy(self, n, L):
        rng = np.random.default_rng(n * 1000 + L)
        a = _random_tokens(rng, n, L)
        want = canonical_tokens(a)
        got = postproc.canonicalize(a, EOS, 3)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("n,L", [(1, 1), (64, 20), (500, 33)])
    def test_unique_count_matches_key_set(self, n, L):
        rng = np.random.default_rng(n + L)
        a = _random_tokens(rng, n, L)
        canon = postproc.canonicalize(a, EOS, 3)
        assert postproc.unique_count(canon) == len(_key_set(a, EOS, 3))

    def test_novel_counts_match_numpy_sets(self):
        rng = np.random.default_rng(7)
        gen = _random_tokens(rng, 200, 16)
        ref = _random_tokens(rng, 150, 16)
        ref[:50] = gen[:50]  # guarantee overlap
        gc = postproc.canonicalize(gen, EOS, 3)
        rc = postproc.canonicalize(ref, EOS, 3)
        distinct, novel = postproc.novel_counts(gc, rc)
        gk = _key_set(gen, EOS, 3)
        rk = _key_set(ref, EOS, 3)
        assert distinct == len(gk)
        assert novel == len(gk - rk)

    @pytest.mark.parametrize("n,L", [(1, 1), (64, 20), (333, 17)])
    def test_validity_matches_python_loop(self, n, L):
        rng = np.random.default_rng(n * 7 + L)
        a = _random_tokens(rng, n, L)
        assert postproc.validity_count(a, EOS) / n == _python_validity(a)

    def test_uint8_tokens_accepted(self):
        """generate.py ships uint8 tokens for small vocabs; the matrix
        coercion must widen them, not reject or misread them."""
        rng = np.random.default_rng(3)
        a = _random_tokens(rng, 50, 9).astype(np.uint8)
        assert uniqueness(a) == uniqueness(a.astype(np.int32))
        assert selfies_validity(a, []) == _python_validity(a)


class TestFallback:
    def test_metrics_identical_without_native(self, monkeypatch):
        """uniqueness/novelty/validity must return the same numbers with
        the native library monkeypatched away."""
        rng = np.random.default_rng(11)
        gen = _random_tokens(rng, 120, 14)
        ref = _random_tokens(rng, 80, 14)
        with_native = (uniqueness(gen), novelty(gen, ref),
                       selfies_validity(gen, []))
        monkeypatch.setattr(postproc, "_lib", lambda: None)
        without = (uniqueness(gen), novelty(gen, ref),
                   selfies_validity(gen, []))
        assert with_native == without

    def test_ragged_input_uses_python_path(self):
        """Ragged row lists can't form a matrix; the per-row Python loop
        must still serve them (validity only — metrics take matrices)."""
        rows = [[1, 5, EOS], [4, 4, 4, 4, EOS, 0], [EOS]]
        assert postproc.as_token_matrix(rows) is None
        assert selfies_validity(rows, []) == pytest.approx(2 / 3)
