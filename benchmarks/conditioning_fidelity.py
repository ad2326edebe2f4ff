#!/usr/bin/env python3
"""Conditioning-fidelity benchmark.

Measures whether conditional generation actually obeys the property target:
generate batches at several TPSA targets from a trained checkpoint and
compare the achieved (synthetic-formula) TPSA of the generated sequences.
Only meaningful for the synthetic corpus, whose TPSA is a known function of
the sequence (``data/prepare.py:synthetic_tpsa``).

Example (checkpoint from a 30-epoch run on the synthetic corpus):

    python benchmarks/conditioning_fidelity.py \
        --checkpoint ckpt/checkpoint_best.npz --data d.json

Measured on the committed examples/ run: target 50 -> 52.3+-10.8,
90 -> 90.7+-4.3, 130 -> 128.3+-4.3 (the conditioning pathway controls
generation; the reference cannot demonstrate this — its decoder never
consumes z and conditions only via the input concat).

``--chem``: score with REAL chemistry instead — decode each generated row
as SELFIES -> molecule (vendored backend, ``mlx_vae_tpu/chem``) and
measure Ertl TPSA of the decoded structures (the reference's actual
conditioning property, ``/root/reference/mlx_data/dataloader.py:39-65``).
Requires a checkpoint trained on a chemistry corpus
(``prepare.py --drug_like N``) and the corpus JSON for its alphabet.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--targets", type=float, nargs="+",
                    default=[50.0, 90.0, 130.0])
    ap.add_argument("--batch_size", type=int, default=2048)
    ap.add_argument("--max_length", type=int, default=64)
    ap.add_argument("--temperature", type=float, default=0.8)
    ap.add_argument("--chem", action="store_true",
                    help="score decoded molecules with the vendored "
                         "chemistry backend (Ertl TPSA) instead of the "
                         "synthetic token formula")
    ap.add_argument("--properties", default="tpsa",
                    help="comma-separated condition keys the checkpoint was "
                         "trained with (--chem multi-property sweeps: the "
                         "FIRST key is swept over --targets, the rest are "
                         "held at their corpus means, and ALL achieved "
                         "descriptors are scored)")
    ap.add_argument("--output", default="benchmarks/conditioning_fidelity.json")
    # model shape flags (must match checkpoint)
    ap.add_argument("--vocab_size", type=int, default=80)
    ap.add_argument("--embedding_dim", type=int, default=128)
    ap.add_argument("--hidden_dim", type=int, default=256)
    ap.add_argument("--latent_dim", type=int, default=128)
    ap.add_argument("--num_layers", type=int, default=2)
    args = ap.parse_args()

    from mlx_vae_tpu.config import ModelConfig
    from mlx_vae_tpu.data.prepare import synthetic_tpsa
    from mlx_vae_tpu.data.split import load_and_split
    from mlx_vae_tpu.models.sampling import generate_with_temperature
    from mlx_vae_tpu.ops.pallas_decoder import (pallas_generate,
                                                pallas_generate_supported)
    from mlx_vae_tpu.train.checkpoint import load_checkpoint

    prop_keys = tuple(k.strip() for k in args.properties.split(",")
                      if k.strip())
    mcfg = ModelConfig(vocab_size=args.vocab_size,
                       embedding_dim=args.embedding_dim,
                       hidden_dim=args.hidden_dim, latent_dim=args.latent_dim,
                       num_layers=args.num_layers,
                       num_conditions=len(prop_keys),
                       compute_dtype="bfloat16",
                       use_pallas=jax.default_backend() == "tpu")
    dec = load_checkpoint(args.checkpoint)["params"]["decoder"]
    train_ds, _, _, _ = load_and_split(args.data, property_keys=prop_keys)
    mean, std = train_ds.properties_mean, train_ds.properties_std

    alphabet = None
    if args.chem:
        from mlx_vae_tpu.data.metrics import molecule_metrics
        with open(args.data) as f:
            alphabet = json.load(f).get("alphabet")
        if not alphabet:
            sys.exit("--chem needs a corpus JSON with an 'alphabet' "
                     "(prepare.py --drug_like / --smiles)")

    def achieved_descriptors(toks):
        """Decode rows -> per-descriptor arrays {key: values} for every
        conditioned property (vendored backend; shared decode+perceive
        kernel ``data/metrics.decoded_mols``)."""
        from mlx_vae_tpu.chem.descriptors import clogp, mol_weight, tpsa
        from mlx_vae_tpu.data.metrics import decoded_mols
        fns = {"tpsa": tpsa, "logp": clogp, "mw": mol_weight}
        vals = {k: [] for k in prop_keys}
        n_dec = 0
        for mol in decoded_mols(toks, alphabet):
            n_dec += 1
            for k in prop_keys:
                vals[k].append(fns[k](mol))
        return n_dec, {k: np.asarray(v) for k, v in vals.items()}

    fused = pallas_generate_supported(mcfg, args.batch_size,
                                      greedy=False)
    results = []
    for target in args.targets:
        # Sweep property 0; hold the rest at their corpus means (z-score 0).
        cond = jnp.zeros((args.batch_size, len(prop_keys)), jnp.float32)
        cond = cond.at[:, 0].set(float((target - mean[0, 0]) / std[0, 0]))
        z = jax.random.normal(jax.random.PRNGKey(0),
                              (args.batch_size, mcfg.latent_dim))
        gen = pallas_generate if fused else generate_with_temperature
        toks = np.asarray(gen(dec, mcfg, z, cond, jax.random.PRNGKey(1),
                              max_length=args.max_length,
                              temperature=args.temperature))
        if args.chem and len(prop_keys) > 1:
            n_dec, desc = achieved_descriptors(toks)
            if n_dec == 0:
                sys.exit("nothing decoded — wrong checkpoint/corpus pairing?")
            swept = desc[prop_keys[0]]
            row = {"target": target,
                   "swept_property": prop_keys[0],
                   "decoded": n_dec,
                   "decode_rate": n_dec / len(toks),
                   "achieved_mean": float(swept.mean()),
                   "achieved_std": float(swept.std()),
                   "mae": float(np.abs(swept - target).mean()),
                   "held_properties": {},
                   "backend": "vendored-ertl"}
            for i, k in enumerate(prop_keys[1:], start=1):
                held_target = float(mean[0, i])   # z-score 0 = corpus mean
                row["held_properties"][k] = {
                    "held_at": held_target,
                    "achieved_mean": float(desc[k].mean()),
                    "achieved_std": float(desc[k].std()),
                    "mae": float(np.abs(desc[k] - held_target).mean()),
                }
            results.append(row)
        elif args.chem:
            mm = molecule_metrics(toks, alphabet, target_tpsa=target,
                                  sample=len(toks))
            if mm is None or "tpsa_mean" not in mm:
                sys.exit("chemistry backend unavailable or nothing decoded")
            results.append({"target": target,
                            "decoded": mm["decoded"],
                            "decode_rate": mm["decoded"] / mm["sampled"],
                            "achieved_mean": mm.get("tpsa_mean"),
                            "achieved_std": mm.get("tpsa_std"),
                            "mae": mm.get("tpsa_mae"),
                            "backend": "vendored-ertl"})
        else:
            achieved = np.array([synthetic_tpsa(t, mcfg.vocab_size)
                                 for t in toks])
            results.append({"target": target,
                            "achieved_mean": float(achieved.mean()),
                            "achieved_std": float(achieved.std()),
                            "mae": float(np.abs(achieved - target).mean())})
        print(f"target {target:6.1f}: achieved "
              f"{results[-1]['achieved_mean']:6.1f} "
              f"± {results[-1]['achieved_std']:5.1f} "
              f"(MAE {results[-1]['mae']:.1f})")

    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
