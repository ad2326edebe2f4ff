"""Vendored chemistry toolkit tests (``mlx_vae_tpu/chem``).

Covers the three layers VERDICT r3 asked to make real (missing #1):

* SMILES parse/write round trips + valence rejection (the rdkit
  ``MolFromSmiles`` contract the pipeline filters with,
  ``/root/reference/mlx_data/dataloader.py:39-65``);
* SELFIES encode/decode: drug round trips, published benzene encoding,
  and the robustness theorem (random symbol soup always decodes to a
  valence-valid molecule) that underlies chemical-validity scoring;
* Ertl TPSA golden values against well-known molecules (rdkit-default
  N/O semantics) + MW exactness;
* corpus generation: every product parses, round-trips, and the
  property spread is drug-like;
* the prepare.py integration: vendored backend active, bulk validity
  fast path == per-row decode path.
"""

import random

import numpy as np
import pytest

from mlx_vae_tpu.chem import (canonical_smiles, clogp, corpus,
                              mol_from_smiles, mol_to_smiles, mol_weight,
                              selfies_to_mol, selfies_to_smiles,
                              smiles_to_selfies, split_selfies, tpsa)
from mlx_vae_tpu.chem import selfies_codec as sc


DRUG_SMILES = [smi for _, smi in corpus.KNOWN_DRUGS]


class TestSmiles:
    @pytest.mark.parametrize("smi", DRUG_SMILES)
    def test_known_drugs_parse_and_roundtrip(self, smi):
        mol = mol_from_smiles(smi)
        assert mol is not None, smi
        can = mol_to_smiles(mol)
        again = mol_from_smiles(can)
        assert again is not None, can
        assert mol_to_smiles(again) == can  # canonical fixed point

    @pytest.mark.parametrize("bad", [
        "", "C(", "C1CC", "C(C)(C)(C)(C)C",   # syntax / valence
        "c1ccc1",                              # anti-aromatic (4 pi)
        "N(=O)(=O)=O",                         # N hexavalent
        "O=C=O=C",                             # O trivalent neutral
        "c1cc[n]c1", "c1ccnc1",                # pyrrole MUST be [nH] (rdkit
                                               # parity: plain n fails to
                                               # kekulize, never H-pinned)
    ])
    def test_invalid_rejected(self, bad):
        assert mol_from_smiles(bad) is None

    # ---- multi-fragment input (salts / mixtures: raw ChEMBL rows) ----

    @pytest.mark.parametrize("smi,want", [
        ("CC.O", "CC"),                        # largest by heavy atoms
        ("CC(=O)O.[Na+]", "CC(=O)O"),          # carboxylate sodium salt
        ("Cl.NCCO", "C(O)CN"),                 # hydrochloride stripped
        ("[Cl-].[Cl-].NCCN", "C(N)CN"),        # dihydrochloride
    ])
    def test_largest_fragment_kept(self, smi, want):
        assert canonical_smiles(smi) == canonical_smiles(want)

    def test_multifragment_opt_out(self):
        assert mol_from_smiles("CC.O",
                               keep_largest_fragment=False) is None
        assert mol_from_smiles("CCO",
                               keep_largest_fragment=False) is not None

    def test_cross_dot_ring_closure_is_one_fragment(self):
        # 'C1.C1' is ethane per the SMILES spec: a dot separates atoms,
        # but the ring-closure pair still bonds across it.
        assert canonical_smiles("C1.C1") == canonical_smiles("CC")

    # ---- tetrahedral stereo (parse -> canonical write w/ parity) ----

    def test_stereo_roundtrip_fixed_point(self):
        can = canonical_smiles("N[C@@H](C)C(=O)O")  # L-alanine form
        assert "@" in can
        assert canonical_smiles(can) == can

    def test_stereo_transposition_equivalence(self):
        # Swapping two written neighbors + flipping the tag is the SAME
        # configuration; all forms must canonicalize identically.
        forms = ["N[C@@H](C)C(=O)O",
                 "N[C@H](C(=O)O)C",    # branch swap + flip
                 "C[C@H](N)C(=O)O"]    # different first neighbor + flip
        cans = {canonical_smiles(f) for f in forms}
        assert len(cans) == 1, cans

    def test_enantiomers_canonicalize_differently(self):
        a = canonical_smiles("N[C@@H](C)C(=O)O")
        b = canonical_smiles("N[C@H](C)C(=O)O")
        assert a is not None and b is not None and a != b

    def test_achiral_write_has_no_tags(self):
        assert "@" not in canonical_smiles("NC(C)C(=O)O")

    def test_bad_stereo_dropped_not_fatal(self):
        # a "@" on a CH2 (two heavy neighbors + 2 H) is not a tetrahedral
        # center; rdkit-style sanitization drops the tag instead of failing
        can = canonical_smiles("C[C@H2]C")
        assert can is not None and "@" not in can
        assert can == canonical_smiles("CCC")

    # ---- directional (E/Z) bonds ----

    def test_ez_roundtrip_and_distinct(self):
        t = canonical_smiles("F/C=C/F")    # trans
        c = canonical_smiles("F/C=C\\F")   # cis
        assert t is not None and c is not None and t != c
        assert canonical_smiles(t) == t
        assert canonical_smiles(c) == c

    def test_ez_equivalent_writings_match(self):
        # global flip of every direction symbol is the same geometry …
        assert canonical_smiles("F/C=C/F") == canonical_smiles("F\\C=C\\F")

    def test_plain_double_bond_no_direction(self):
        assert "/" not in canonical_smiles("FC=CF")

    def test_pyrrole_needs_explicit_h(self):
        # the [nH] form is the valid pyrrole; both plain-n forms above are
        # rejected, matching rdkit
        assert canonical_smiles("c1cc[nH]c1") is not None

    def test_canonicalization_is_form_invariant(self):
        # different written forms of the same molecule canonicalize equal
        pairs = [
            ("c1ccccc1", "C1=CC=CC=C1"),
            ("CC(=O)Nc1ccc(O)cc1", "Oc1ccc(NC(C)=O)cc1"),
            ("c1ccncc1", "C1=CC=NC=C1"),
            ("OCC", "CCO"),
        ]
        for a, b in pairs:
            assert canonical_smiles(a) == canonical_smiles(b), (a, b)

    def test_aromaticity_perception_on_kekulized_input(self):
        mol = mol_from_smiles("C1=CC=CC=C1")  # benzene written Kekulé
        assert all(a.aromatic for a in mol.atoms)
        mol = mol_from_smiles("C1CCCCC1")  # cyclohexane is not
        assert not any(a.aromatic for a in mol.atoms)

    def test_implicit_hydrogens(self):
        mol = mol_from_smiles("CC(=O)N")  # acetamide
        h = [mol.implicit_h(i) for i in range(len(mol.atoms))]
        assert h == [3, 0, 0, 2]
        assert mol_weight(mol) == pytest.approx(59.068, abs=0.01)


class TestSelfies:
    @pytest.mark.parametrize("smi", DRUG_SMILES)
    def test_drug_roundtrip(self, smi):
        can = canonical_smiles(smi)
        sf = smiles_to_selfies(smi)
        assert sf is not None
        assert selfies_to_smiles(sf) == can

    def test_benzene_matches_published_encoding(self):
        # the canonical example from the SELFIES paper / library docs
        assert smiles_to_selfies("C1=CC=CC=C1") == \
            "[C][=C][C][=C][C][=C][Ring1][=Branch1]"

    def test_robustness_random_soup_always_valid(self):
        alpha = ["[C]", "[=C]", "[#C]", "[O]", "[=O]", "[N]", "[=N]",
                 "[#N]", "[S]", "[F]", "[Cl]", "[Br]", "[Branch1]",
                 "[=Branch1]", "[#Branch1]", "[Branch2]", "[Ring1]",
                 "[Ring2]", "[=Ring1]", "[P]", "[NH1]", "[O-1]", "[N+1]",
                 "[nop]"]
        rng = random.Random(7)
        decoded = 0
        for _ in range(500):
            toks = [rng.choice(alpha) for _ in range(rng.randint(1, 40))]
            mol = selfies_to_mol(toks)
            if mol is None:
                continue
            decoded += 1
            assert mol.is_valid(), "".join(toks)
            out = mol_to_smiles(mol)
            assert mol_from_smiles(out) is not None, (out, "".join(toks))
        assert decoded > 400  # almost everything decodes non-empty

    def test_split_selfies(self):
        assert split_selfies("[C][=O]") == ["[C]", "[=O]"]
        with pytest.raises(ValueError):
            split_selfies("[C]x")

    def test_derivation_nonempty_matches_decoder(self):
        alpha = ["<pad>", "<start>", "<eos>", "[C]", "[Branch1]", "[Ring1]",
                 "[=Branch1]", "[O]", "[nop]"]
        kinds, nsyms, ivals = sc.classify_symbols(alpha)
        rng = random.Random(3)
        for _ in range(400):
            ids = [rng.randint(3, len(alpha) - 1)
                   for _ in range(rng.randint(1, 12))]
            stream = [t for t in ids if kinds[t] != sc.KIND_NOP]
            fast = sc.derivation_nonempty(stream, kinds, nsyms, ivals)
            mol = selfies_to_mol([alpha[t] for t in stream])
            assert fast == (mol is not None), [alpha[t] for t in ids]


class TestDescriptors:
    # rdkit-default TPSA golden values (Ertl N/O table)
    GOLDEN_TPSA = [
        ("c1ccccc1", 0.0), ("c1ccncc1", 12.89), ("Nc1ccccc1", 26.02),
        ("Oc1ccccc1", 20.23), ("CCO", 20.23),
        ("CC(=O)Oc1ccccc1C(=O)O", 63.60),        # aspirin
        ("Cn1cnc2c1c(=O)n(C)c(=O)n2C", 61.82),   # caffeine
        ("CC(=O)Nc1ccc(O)cc1", 49.33),           # paracetamol
        ("CC(C)Cc1ccc(cc1)C(C)C(=O)O", 37.30),   # ibuprofen
        ("O=[N+]([O-])c1ccccc1", 45.82),         # nitrobenzene (charged form)
        ("NC(=O)c1ccccc1", 43.09),               # benzamide
        ("c1cc[nH]c1", 15.79), ("c1c[nH]cn1", 28.68),
        ("C1COCCN1", 21.26), ("N#Cc1ccccc1", 23.79),
        ("c1ccoc1", 13.14), ("C1CCNCC1", 12.03),
        ("CS(=O)(=O)N", 60.16),                  # S excluded, NH2 + 2 =O
        ("C[N+](C)(C)C", 0.0),
        # aromatic-N environments classified by aromatic BONDS, not
        # aromatic neighbors: the N-aryl single bond joins two aromatic
        # atoms but is exocyclic (rdkit: 4.93/17.82, not bridgehead 4.41)
        ("c1ccc(cc1)n1cccc1", 4.93),             # N-phenylpyrrole
        ("c1ccc(cc1)n1ccnc1", 17.82),            # N-phenylimidazole
        ("c1ccccc1c1ccccc1", 0.0),               # biphenyl, default bond
    ]

    @pytest.mark.parametrize("smi,want", GOLDEN_TPSA)
    def test_tpsa_golden(self, smi, want):
        assert tpsa(mol_from_smiles(smi)) == pytest.approx(want, abs=0.01)

    GOLDEN_MW = [
        ("c1ccccc1", 78.11), ("CCO", 46.07), ("Cl", 36.46),
        ("CC(=O)Oc1ccccc1C(=O)O", 180.16),
        ("Cn1cnc2c1c(=O)n(C)c(=O)n2C", 194.19),
    ]

    @pytest.mark.parametrize("smi,want", GOLDEN_MW)
    def test_mw_golden(self, smi, want):
        assert mol_weight(mol_from_smiles(smi)) == pytest.approx(want,
                                                                 abs=0.02)

    def test_clogp_qualitative(self):
        """clogp is documented approximate: assert orderings, not values."""
        def lp(s):
            return clogp(mol_from_smiles(s))
        assert lp("CCCCCCCC") > lp("CCO") > lp("OCCO")      # lipophilicity
        assert lp("c1ccccc1") > 1.0                          # benzene ~1.7
        assert lp("Clc1ccccc1") > lp("c1ccccc1")             # Cl adds
        assert lp("OC(=O)c1ccccc1O") < lp("c1ccccc1")        # polar cuts

    def test_tpsa_additivity_sanity(self):
        # adding a hydroxyl adds the 20.23 OH contribution
        assert tpsa(mol_from_smiles("Oc1ccccc1")) - \
            tpsa(mol_from_smiles("c1ccccc1")) == pytest.approx(20.23)


class TestCorpus:
    def test_generated_molecules_all_valid_and_roundtrip(self):
        smiles = corpus.generate_smiles(300, seed=11, include_known=False)
        assert len(smiles) == len(set(smiles)) == 300
        for s in smiles:
            mol = mol_from_smiles(s)
            assert mol is not None, s
            assert selfies_to_smiles(smiles_to_selfies(s)) == \
                mol_to_smiles(mol), s

    def test_deterministic(self):
        a = corpus.generate_smiles(50, seed=5)
        b = corpus.generate_smiles(50, seed=5)
        assert a == b
        c = corpus.generate_smiles(50, seed=6, include_known=False)
        assert a != c

    def test_property_spread_is_drug_like(self):
        smiles = corpus.generate_smiles(400, seed=2)
        t = np.array([tpsa(mol_from_smiles(s)) for s in smiles])
        w = np.array([mol_weight(mol_from_smiles(s)) for s in smiles])
        assert 30 < t.mean() < 80 and t.std() > 15
        assert 150 < w.mean() < 320


class TestPrepareIntegration:
    def test_vendored_backend_active(self):
        from mlx_vae_tpu.data import prepare as prep
        assert prep.chemistry_backend() == "vendored"
        assert prep.selfies_available()

    def test_prepare_from_smiles_real_chemistry(self):
        from mlx_vae_tpu.data import prepare as prep
        data = prep.prepare_from_smiles(
            ["CC(=O)Oc1ccccc1C(=O)O", "not-a-molecule", "CCO"],
            max_length=64)
        assert len(data["molecules"]) == 2  # invalid filtered
        assert data["molecules"][0]["tpsa"] == pytest.approx(63.60)
        assert data["molecules"][1]["tpsa"] == pytest.approx(20.23)
        assert data["alphabet"][:3] == ["<pad>", "<start>", "<eos>"]
        # tokens decode back to the canonical molecule
        seq = data["tokenized_sequences"][0]
        s = prep.decode_tokens(seq, data["alphabet"])
        assert selfies_to_smiles(s) == \
            canonical_smiles("CC(=O)Oc1ccccc1C(=O)O")

    def test_bulk_validity_matches_per_row_decode(self):
        from mlx_vae_tpu.data import prepare as prep
        data = prep.prepare_from_smiles(DRUG_SMILES[:20], max_length=80)
        alpha = data["alphabet"]
        rng = np.random.default_rng(0)
        n, L = 200, 40
        # mix: real sequences, random garbage, empty rows
        mat = rng.integers(0, len(alpha), size=(n, L)).astype(np.int32)
        for i, seq in enumerate(data["tokenized_sequences"][:10]):
            mat[i, :] = 0
            mat[i, : min(L, len(seq))] = seq[:L]
        mat[10:13, :] = 0
        mat[10:13, 0] = prep.EOS
        fast = prep.selfies_validity(mat, alpha)
        slow = 0
        for row in mat:
            s = prep.decode_tokens(row, alpha)
            try:
                smi = prep._selfies.decoder(s)
                slow += prep._Chem.MolFromSmiles(smi) is not None
            except Exception:
                pass
        assert fast == pytest.approx(slow / n)

    def test_synthetic_alphabet_keeps_proxy(self):
        from mlx_vae_tpu.data import prepare as prep
        data = prep.make_synthetic_dataset(n=16, vocab_size=20, max_length=16)
        seqs = data["tokenized_sequences"]
        L = max(len(s) for s in seqs)
        mat = np.zeros((len(seqs), L), np.int32)
        for i, s in enumerate(seqs):
            mat[i, : len(s)] = s
        # every synthetic row is EOS-terminated and non-empty
        assert prep.selfies_validity(mat, data["alphabet"]) == 1.0
