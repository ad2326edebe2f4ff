import json

import numpy as np
import pytest

from mlx_vae_tpu.data import MoleculeDataset, load_and_split, split_indices
from mlx_vae_tpu.data import packer
from mlx_vae_tpu.data.prepare import make_synthetic_dataset


def test_pack_sequences_native_matches_numpy():
    seqs = [[1, 2, 3], [4, 5], list(range(20)), []]
    a = packer.pack_sequences(seqs, max_length=8, pad_token=0)
    b = packer.pack_sequences_numpy(seqs, max_length=8, pad_token=0)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.int32
    # truncation + padding semantics (reference dataloader.py:70-84)
    assert list(a[0]) == [1, 2, 3, 0, 0, 0, 0, 0]
    assert list(a[2]) == list(range(8))


def test_normalization_and_std_floor():
    seqs = [[1, 2], [3, 4], [5, 6]]
    props = np.array([[10.0, 5.0], [20.0, 5.0], [30.0, 5.0]], np.float32)
    ds = MoleculeDataset(seqs, props, max_length=4)
    # second property has zero std -> floored to 1.0 (dataloader.py:56-60)
    assert ds.properties_std[0, 1] == 1.0
    np.testing.assert_allclose(ds.properties_normalized.mean(axis=0)[0], 0.0, atol=1e-6)


def test_train_stats_propagate():
    seqs = [[1]] * 4
    train = MoleculeDataset(seqs, np.array([[0.], [1.], [2.], [3.]], np.float32), 4)
    val = MoleculeDataset(seqs, np.array([[10.]] * 4, np.float32), 4,
                          properties_mean=train.properties_mean,
                          properties_std=train.properties_std)
    # val normalized with train stats, not its own
    assert val.properties_normalized[0, 0] > 5.0


def test_split_is_seed67_deterministic():
    tr1, v1, te1 = split_indices(100, seed=67)
    tr2, v2, te2 = split_indices(100, seed=67)
    np.testing.assert_array_equal(tr1, tr2)
    assert len(tr1) == 80 and len(v1) == 10 and len(te1) == 10
    # Exact reproduction of the reference's np.random.seed(67) shuffle
    np.random.seed(67)
    idx = np.arange(100)
    np.random.shuffle(idx)
    np.testing.assert_array_equal(tr1, idx[:80])


def test_to_batches_shapes_and_partial():
    seqs = [[1, 2, 3]] * 10
    ds = MoleculeDataset(seqs, np.arange(10, dtype=np.float32)[:, None], 6)
    batches = list(ds.to_batches(4, shuffle=False))
    assert [b[0].shape[0] for b in batches] == [4, 4, 2]  # partial last kept
    assert batches[0][0].shape == (4, 6)
    assert batches[0][1].shape == (4, 1)
    batches = list(ds.to_batches(4, shuffle=False, drop_last=True))
    assert [b[0].shape[0] for b in batches] == [4, 4]


def test_load_and_split_roundtrip(tmp_path):
    data = make_synthetic_dataset(n=50, vocab_size=24, max_length=16,
                                  path=str(tmp_path / "d.json"))
    train, val, test, raw = load_and_split(str(tmp_path / "d.json"))
    assert len(train) == 40 and len(val) == 5 and len(test) == 5
    assert train.molecules.shape[1] == 16
    assert raw["max_length"] == 16
    # multi-property conditioning
    train3, _, _, _ = load_and_split(str(tmp_path / "d.json"),
                                     property_keys=("tpsa", "logp", "mw"))
    assert train3.properties_normalized.shape[1] == 3


def test_gather_rows():
    data = np.arange(20, dtype=np.int32).reshape(5, 4)
    idx = np.array([3, 0, 3])
    np.testing.assert_array_equal(packer.gather_rows(data, idx), data[idx])
