"""Dataset preparation tool.

The reference's dataset blob (``mlx_data/chembl_cns_selfies.json``) is
gitignored and absent (``/root/reference/.MISSING_LARGE_BLOBS:1``), so the
framework must be able to (re)generate one. Two paths:

* ``prepare_from_smiles``: real pipeline — SELFIES tokenization + property
  computation (TPSA/LogP/MW) via ``selfies``/``rdkit``. Both are optional
  dependencies and gated; this environment does not ship them.
* ``make_synthetic_dataset``: deterministic synthetic corpus with the same
  JSON schema, used by tests and benchmarks. Sequences are grammar-like token
  strings whose composition correlates with the generated properties, so the
  conditional pathway has real signal to learn.

Schema (inferred from ``/root/reference/train.py:79-87``)::

    {"molecules": [{"tpsa": float, "logp": float, "mw": float}, ...],
     "tokenized_sequences": [[int, ...], ...],
     "max_length": int,
     "alphabet": [str, ...]}    # extra key, ignored by the reference surface
"""

from __future__ import annotations

import json
from typing import List, Optional

import numpy as np

PAD, START, EOS = 0, 1, 2
_SPECIALS = ["<pad>", "<start>", "<eos>"]

try:  # optional deps — not in this image
    import selfies as _selfies  # type: ignore
except ImportError:
    _selfies = None
try:
    from rdkit import Chem as _Chem  # type: ignore
    from rdkit.Chem import Descriptors as _Desc  # type: ignore
except ImportError:
    _Chem = None
    _Desc = None


def selfies_available() -> bool:
    return _selfies is not None and _Chem is not None


def make_synthetic_dataset(
    n: int = 2048,
    vocab_size: int = 80,
    max_length: int = 64,
    seed: int = 0,
    path: Optional[str] = None,
) -> dict:
    """Deterministic synthetic dataset matching the reference JSON schema.

    Each "molecule" is a Markov-ish token walk ending in EOS. TPSA is a noisy
    linear function of sequence length and heavy-token fraction; LogP/MW are
    other deterministic functions, giving multi-property conditioning
    (BASELINE.json config 3) learnable structure.
    """
    rng = np.random.default_rng(seed)
    alphabet = _SPECIALS + [f"[T{i}]" for i in range(3, vocab_size)]

    seqs: List[List[int]] = []
    molecules = []
    # Transition kernel: prefer staying in a token "band" -> learnable structure.
    for _ in range(n):
        length = int(rng.integers(8, max_length - 1))
        band = int(rng.integers(3, vocab_size - 8))
        toks = [START]
        t = band
        for _ in range(length - 2):
            step = int(rng.integers(-3, 4))
            t = int(np.clip(t + step, 3, vocab_size - 1))
            toks.append(t)
        toks.append(EOS)
        seqs.append(toks)

        heavy_frac = float(np.mean([tk > vocab_size // 2 for tk in toks]))
        tpsa = 20.0 + 1.1 * len(toks) + 45.0 * heavy_frac + float(rng.normal(0, 2.0))
        logp = -1.0 + 0.05 * len(toks) - 2.0 * heavy_frac + float(rng.normal(0, 0.2))
        mw = 80.0 + 6.0 * len(toks) + float(rng.normal(0, 5.0))
        molecules.append({"tpsa": tpsa, "logp": logp, "mw": mw})

    data = {
        "molecules": molecules,
        "tokenized_sequences": seqs,
        "max_length": max_length,
        "alphabet": alphabet,
    }
    if path is not None:
        with open(path, "w") as f:
            json.dump(data, f)
    return data


def prepare_from_smiles(smiles_list: List[str], max_length: int = 120,
                        path: Optional[str] = None) -> dict:
    """SMILES -> SELFIES tokens + rdkit properties. Requires selfies+rdkit."""
    if not selfies_available():
        raise ImportError(
            "prepare_from_smiles requires the optional 'selfies' and 'rdkit' "
            "packages; use make_synthetic_dataset() in environments without them."
        )
    alphabet_set = set()
    encoded = []
    molecules = []
    for smi in smiles_list:
        mol = _Chem.MolFromSmiles(smi)
        if mol is None:
            continue
        sf = _selfies.encoder(smi)
        toks = list(_selfies.split_selfies(sf))
        alphabet_set.update(toks)
        encoded.append(toks)
        molecules.append({
            "tpsa": float(_Desc.TPSA(mol)),
            "logp": float(_Desc.MolLogP(mol)),
            "mw": float(_Desc.MolWt(mol)),
        })
    alphabet = _SPECIALS + sorted(alphabet_set)
    tok2id = {t: i for i, t in enumerate(alphabet)}
    seqs = [[START] + [tok2id[t] for t in toks] + [EOS] for toks in encoded]
    data = {
        "molecules": molecules,
        "tokenized_sequences": seqs,
        "max_length": max_length,
        "alphabet": alphabet,
    }
    if path is not None:
        with open(path, "w") as f:
            json.dump(data, f)
    return data


def decode_tokens(tokens, alphabet, end_token: int = EOS) -> str:
    """Token ids -> SELFIES string (stops at EOS, skips specials)."""
    out = []
    for t in tokens:
        t = int(t)
        if t == end_token:
            break
        if t < len(_SPECIALS):
            continue
        out.append(alphabet[t] if t < len(alphabet) else f"[UNK{t}]")
    return "".join(out)


def selfies_validity(token_batches, alphabet) -> float:
    """Fraction of decoded sequences that are valid molecules.

    With rdkit+selfies present: true chemical validity (decode SELFIES ->
    SMILES -> rdkit parse). Otherwise a structural proxy: sequence is
    non-empty and terminated by EOS within max_length. The proxy routes
    rectangular token matrices to the native post-processor
    (``native/postproc.cpp``) when available — at the 1M-molecule bulk
    scale the per-row Python loop below costs more than generation itself.
    """
    if not selfies_available():
        from mlx_vae_tpu.data import postproc
        mat = postproc.as_token_matrix(token_batches)
        if mat is not None:
            count = postproc.validity_count(mat, EOS)
            if count is not None:
                return count / mat.shape[0]
    n = 0
    ok = 0
    for toks in token_batches:
        n += 1
        toks = list(map(int, toks))
        if selfies_available():
            s = decode_tokens(toks, alphabet)
            try:
                smi = _selfies.decoder(s)
                ok += _Chem.MolFromSmiles(smi) is not None
            except Exception:
                pass
        else:
            has_eos = EOS in toks
            nonempty = any(t > EOS for t in (toks[: toks.index(EOS)] if has_eos else toks))
            ok += has_eos and nonempty
    return ok / max(1, n)


def main(argv=None):
    """Dataset-prep CLI: ``python -m mlx_vae_tpu.data.prepare``."""
    import argparse

    ap = argparse.ArgumentParser(description="Prepare a molecules dataset JSON")
    ap.add_argument("--output", required=True, help="output JSON path")
    ap.add_argument("--smiles", default=None,
                    help="text file of SMILES (one per line); requires selfies+rdkit")
    ap.add_argument("--synthetic", type=int, default=0, metavar="N",
                    help="generate an N-molecule synthetic dataset instead")
    ap.add_argument("--max_length", type=int, default=64)
    ap.add_argument("--vocab_size", type=int, default=80,
                    help="(synthetic only) vocabulary size")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.smiles:
        with open(args.smiles) as f:
            smiles = [line.strip() for line in f if line.strip()]
        data = prepare_from_smiles(smiles, max_length=args.max_length,
                                   path=args.output)
        print(f"Prepared {len(data['tokenized_sequences'])} molecules "
              f"(alphabet {len(data['alphabet'])}) -> {args.output}")
    elif args.synthetic:
        make_synthetic_dataset(n=args.synthetic, vocab_size=args.vocab_size,
                               max_length=args.max_length, seed=args.seed,
                               path=args.output)
        print(f"Generated {args.synthetic} synthetic molecules -> {args.output}")
    else:
        ap.error("pass --smiles FILE or --synthetic N")


if __name__ == "__main__":
    main()


def synthetic_tpsa(tokens, vocab_size: int = 80) -> float:
    """The synthetic corpus's TPSA formula (noise-free) applied to a token
    sequence — used to measure conditioning fidelity of generated molecules
    against their TPSA target (only meaningful for synthetic datasets)."""
    toks = list(map(int, tokens))
    if EOS in toks:
        toks = toks[: toks.index(EOS) + 1]
    if not toks:
        return 0.0
    heavy_frac = float(np.mean([t > vocab_size // 2 for t in toks]))
    return 20.0 + 1.1 * len(toks) + 45.0 * heavy_frac
