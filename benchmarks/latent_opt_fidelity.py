#!/usr/bin/env python3
"""Latent-optimization fidelity benchmark.

Does optimize-then-decode (``models/latent_opt.py``) beat plain conditional
generation at hitting a property target? Both arms decode with the target as
the condition input; the optimized arm additionally descends each latent
candidate against the trained z->properties surrogate first. Achieved TPSA
is the synthetic corpus's noise-free formula applied to the decoded tokens
(``data/prepare.py:synthetic_tpsa``) — ground truth, independent of the
surrogate being optimized, so surrogate over-fitting shows up as a gap
between ``pred_after`` and ``achieved``.

Needs a checkpoint trained with --use_property_predictor on the synthetic
corpus:

    python benchmarks/latent_opt_fidelity.py \
        --checkpoint ckpt/checkpoint_best.npz --data d.json

``--chem``: ground truth is REAL chemistry instead — decode each generated
row as SELFIES -> molecule (vendored backend, ``mlx_vae_tpu/chem``) and
measure Ertl TPSA of the decoded structures (the reference's conditioning
property). Needs a predictor checkpoint trained on a chemistry corpus
(``prepare.py --drug_like N``) and that corpus JSON for its alphabet.
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
    ap.add_argument("--opt_steps", type=int, default=300)
    ap.add_argument("--opt_lr", type=float, default=0.05)
    ap.add_argument("--prior_weight", type=float, default=0.01)
    ap.add_argument("--chem", action="store_true",
                    help="score decoded molecules with the vendored "
                         "chemistry backend (Ertl TPSA) instead of the "
                         "synthetic token formula")
    ap.add_argument("--output", default=None,
                    help="default: benchmarks/latent_opt_fidelity.json, "
                         "or ..._chem.json under --chem")
    args = ap.parse_args()
    if args.output is None:
        args.output = ("benchmarks/latent_opt_fidelity_chem.json"
                       if args.chem else
                       "benchmarks/latent_opt_fidelity.json")

    from mlx_vae_tpu.cli.generate import infer_model_shape
    from mlx_vae_tpu.config import ModelConfig
    from mlx_vae_tpu.data.prepare import synthetic_tpsa
    from mlx_vae_tpu.data.split import load_and_split
    from mlx_vae_tpu.models.latent_opt import optimize_latent
    from mlx_vae_tpu.models.sampling import generate_with_temperature
    from mlx_vae_tpu.ops.pallas_decoder import (pallas_generate,
                                                pallas_generate_supported)
    from mlx_vae_tpu.train.checkpoint import load_checkpoint

    ckpt = load_checkpoint(args.checkpoint)
    params = ckpt["params"]
    if "predictor" not in params:
        raise SystemExit("checkpoint has no predictor head — re-train with "
                         "--use_property_predictor")
    mcfg = ModelConfig(compute_dtype="bfloat16",
                       use_pallas=jax.default_backend() == "tpu",
                       **infer_model_shape(params["decoder"]))
    train_ds, _, _, _ = load_and_split(args.data)
    mean, std = train_ds.properties_mean, train_ds.properties_std

    alphabet = None
    if args.chem:
        from mlx_vae_tpu.data.prepare import decode_tokens  # noqa: F401
        from mlx_vae_tpu.chem import mol_to_smiles  # backend presence check
        with open(args.data) as f:
            alphabet = json.load(f).get("alphabet")
        if not alphabet:
            raise SystemExit("--chem needs a corpus JSON with an 'alphabet' "
                             "(prepare.py --drug_like / --smiles)")

    fused = pallas_generate_supported(mcfg, args.batch_size, greedy=False)
    gen = pallas_generate if fused else generate_with_temperature
    opt = jax.jit(lambda z, t: optimize_latent(
        params, mcfg, z, t, steps=args.opt_steps, lr=args.opt_lr,
        prior_weight=args.prior_weight))

    def achieved(toks):
        if args.chem:
            from mlx_vae_tpu.chem import tpsa
            from mlx_vae_tpu.data.metrics import decoded_mols
            return np.array([tpsa(mol)
                             for mol in decoded_mols(toks, alphabet)])
        return np.array([synthetic_tpsa(t, mcfg.vocab_size) for t in toks])

    results = []
    for target in args.targets:
        tn = float((target - mean[0, 0]) / std[0, 0])
        cond = jnp.full((args.batch_size, 1), tn, jnp.float32)
        z0 = jax.random.normal(jax.random.PRNGKey(0),
                               (args.batch_size, mcfg.latent_dim))
        kg = jax.random.PRNGKey(1)

        base = achieved(np.asarray(gen(
            params["decoder"], mcfg, z0, cond, kg,
            max_length=args.max_length, temperature=args.temperature)))

        z_opt, info = opt(z0, jnp.asarray([tn]))
        tuned = achieved(np.asarray(gen(
            params["decoder"], mcfg, z_opt, cond, kg,
            max_length=args.max_length, temperature=args.temperature)))
        pred_after = float(np.asarray(info["pred_final"]).mean()
                           * std[0, 0] + mean[0, 0])

        if args.chem and (len(base) == 0 or len(tuned) == 0):
            raise SystemExit("--chem: nothing decoded; wrong checkpoint/"
                             "corpus pairing?")
        row = {
            "target": target,
            "conditional": {"achieved_mean": float(base.mean()),
                            "achieved_std": float(base.std()),
                            "mae": float(np.abs(base - target).mean())},
            "optimized": {"achieved_mean": float(tuned.mean()),
                          "achieved_std": float(tuned.std()),
                          "mae": float(np.abs(tuned - target).mean()),
                          "surrogate_pred_after": pred_after},
        }
        if args.chem:
            row["conditional"]["decoded"] = int(len(base))
            row["optimized"]["decoded"] = int(len(tuned))
            row["backend"] = "vendored-ertl"
        results.append(row)
        print(f"target {target:6.1f}: conditional {base.mean():6.1f} "
              f"± {base.std():5.1f} (MAE {row['conditional']['mae']:5.1f}) | "
              f"optimized {tuned.mean():6.1f} ± {tuned.std():5.1f} "
              f"(MAE {row['optimized']['mae']:5.1f}, surrogate "
              f"{pred_after:6.1f})")

    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
