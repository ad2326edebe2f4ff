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


class TestMoleculeMetrics:
    """Molecule-level metrics (round 4): canonical-SMILES uniqueness and
    decoded Ertl-TPSA fidelity via the vendored chemistry backend."""

    @pytest.fixture()
    def chem_data(self):
        from mlx_vae_tpu.data import prepare as prep
        smiles = ["CC(=O)Oc1ccccc1C(=O)O", "CCO", "c1ccncc1", "CC(=O)Nc1ccc(O)cc1"]
        return prep.prepare_from_smiles(smiles, max_length=48), smiles

    def _matrix(self, seqs, L=48):
        m = np.zeros((len(seqs), L), np.int32)
        for i, s in enumerate(seqs):
            m[i, : len(s)] = s
        return m

    def test_decoded_tpsa_matches_input_molecules(self, chem_data):
        from mlx_vae_tpu.chem import mol_from_smiles, tpsa
        from mlx_vae_tpu.data.metrics import molecule_metrics
        data, smiles = chem_data
        mat = self._matrix(data["tokenized_sequences"])
        mm = molecule_metrics(mat, data["alphabet"], target_tpsa=50.0)
        assert mm["decoded"] == len(smiles)
        assert mm["mol_uniqueness"] == 1.0
        want = np.mean([tpsa(mol_from_smiles(s)) for s in smiles])
        assert mm["tpsa_mean"] == pytest.approx(want, abs=0.01)
        assert mm["tpsa_mae"] == pytest.approx(
            np.mean([abs(tpsa(mol_from_smiles(s)) - 50.0) for s in smiles]),
            abs=0.01)

    def test_duplicate_molecules_collapse(self, chem_data):
        from mlx_vae_tpu.data.metrics import molecule_metrics
        data, smiles = chem_data
        seqs = data["tokenized_sequences"]
        mat = self._matrix([seqs[0]] * 3 + [seqs[1]])
        mm = molecule_metrics(mat, data["alphabet"])
        assert mm["decoded"] == 4
        assert mm["mol_uniqueness"] == pytest.approx(2 / 4)

    def test_none_for_synthetic_alphabet(self):
        from mlx_vae_tpu.data import prepare as prep
        from mlx_vae_tpu.data.metrics import molecule_metrics
        data = prep.make_synthetic_dataset(n=8, vocab_size=16, max_length=12)
        mat = self._matrix(data["tokenized_sequences"], L=12)
        assert molecule_metrics(mat, data["alphabet"]) is None
        assert molecule_metrics(mat, []) is None

    def test_sampling_is_deterministic(self, chem_data):
        from mlx_vae_tpu.data.metrics import molecule_metrics
        data, _ = chem_data
        seqs = data["tokenized_sequences"]
        mat = self._matrix(seqs * 50)  # 200 rows
        a = molecule_metrics(mat, data["alphabet"], sample=64)
        b = molecule_metrics(mat, data["alphabet"], sample=64)
        assert a == b and a["sampled"] == 64
