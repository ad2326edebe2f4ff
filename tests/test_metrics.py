"""Sample-quality metrics (``data/metrics.py``): uniqueness / novelty.

Golden hand-built cases plus a randomized cross-check against a naive
per-row oracle written independently of the vectorized implementation.
"""

import numpy as np
import pytest

from mlx_vae_tpu.data.metrics import canonical_tokens, novelty, uniqueness

PAD, START, EOS = 0, 1, 2


def naive_key(row, end_token=EOS, num_specials=3):
    """Independent per-row oracle: kept tokens before first EOS, as a tuple."""
    out = []
    for t in map(int, row):
        if t == end_token:
            break
        if t >= num_specials:
            out.append(t)
    return tuple(out)


class TestCanonicalTokens:
    def test_trims_at_first_eos_and_strips_specials(self):
        rows = np.array([
            [START, 5, 6, EOS, 9, 9],    # post-EOS junk ignored
            [START, 5, 6, EOS, PAD, PAD],
            [5, PAD, 6, EOS, PAD, PAD],  # interior pad stripped
        ])
        c = canonical_tokens(rows)
        np.testing.assert_array_equal(c[0], c[1])
        np.testing.assert_array_equal(c[0], c[2])
        np.testing.assert_array_equal(c[0], [5, 6, -1, -1, -1, -1])

    def test_preserves_token_order(self):
        c = canonical_tokens(np.array([[6, 5, EOS, PAD], [5, 6, EOS, PAD]]))
        assert not np.array_equal(c[0], c[1])
        np.testing.assert_array_equal(c[0], [6, 5, -1, -1])

    def test_no_eos_keeps_whole_row(self):
        c = canonical_tokens(np.array([[7, 8, 9, 10]]))
        np.testing.assert_array_equal(c[0], [7, 8, 9, 10])

    def test_empty_molecule(self):
        c = canonical_tokens(np.array([[EOS, 5, 6, 7], [START, EOS, PAD, PAD]]))
        np.testing.assert_array_equal(c, -np.ones((2, 4), np.int32))

    def test_rejects_non_matrix(self):
        with pytest.raises(ValueError, match="B, L"):
            canonical_tokens(np.zeros(5, np.int32))


class TestUniqueness:
    def test_duplicates_after_eos_collapse(self):
        rows = np.array([
            [5, 6, EOS, 9],
            [5, 6, EOS, PAD],   # same molecule
            [5, 7, EOS, PAD],   # different
        ])
        assert uniqueness(rows) == pytest.approx(2 / 3)

    def test_all_distinct(self):
        rows = np.array([[i + 3, EOS] for i in range(10)])
        assert uniqueness(rows) == 1.0

    def test_empty_batch(self):
        assert uniqueness(np.zeros((0, 4), np.int32)) == 0.0


class TestNovelty:
    TRAIN = np.array([
        [START, 5, 6, EOS, PAD, PAD],
        [START, 7, 8, 9, EOS, PAD],
    ])

    def test_overlap_counted_over_unique(self):
        gen = np.array([
            [5, 6, EOS, PAD],      # in train (canonical match across widths)
            [5, 6, EOS, 9],        # same molecule again (dup)
            [10, 11, EOS, PAD],    # novel
        ])
        # unique molecules: {56, 10-11}; one novel -> 0.5
        assert novelty(gen, self.TRAIN) == pytest.approx(0.5)

    def test_mode_collapse_on_novel_molecule(self):
        """MOSES convention: novelty over the UNIQUE set — collapsing onto
        one novel molecule scores 1.0 novelty but 1/N uniqueness."""
        gen = np.tile(np.array([[30, 31, EOS, PAD]]), (8, 1))
        assert novelty(gen, self.TRAIN) == 1.0
        assert uniqueness(gen) == pytest.approx(1 / 8)

    def test_all_memorized(self):
        gen = np.array([[5, 6, EOS], [7, 8, 9]])  # second matches via no-EOS
        # train row 2 canonical = (7,8,9); gen row 2 has no EOS -> (7,8,9)
        assert novelty(gen, self.TRAIN) == 0.0

    def test_empty_reference_all_novel(self):
        gen = np.array([[5, EOS, PAD]])
        assert novelty(gen, np.zeros((0, 6), np.int32)) == 1.0

    def test_empty_batch(self):
        assert novelty(np.zeros((0, 4), np.int32), self.TRAIN) == 0.0


class TestRandomizedOracle:
    def test_matches_naive_implementation(self):
        rng = np.random.default_rng(0)
        for trial in range(5):
            B, L = int(rng.integers(1, 64)), int(rng.integers(1, 20))
            Lr = int(rng.integers(1, 20))
            gen = rng.integers(0, 12, size=(B, L))
            ref = rng.integers(0, 12, size=(int(rng.integers(1, 64)), Lr))

            gkeys = [naive_key(r) for r in gen]
            rkeys = {naive_key(r) for r in ref}
            want_uniq = len(set(gkeys)) / B
            want_nov = len(set(gkeys) - rkeys) / len(set(gkeys))

            assert uniqueness(gen) == pytest.approx(want_uniq)
            assert novelty(gen, ref) == pytest.approx(want_nov)
