#!/usr/bin/env python3
"""Aggregate-posterior vs prior mismatch probe for a trained checkpoint.

Generation samples ``z ~ N(0, I)``; training only ever shows the decoder
``z ~ q(z|x, c)``. When the aggregate posterior drifts from the prior
(weak KL at small beta), prior samples land in posterior holes and the
decoder derails — the observable symptom is an early-EOS collapse of the
decode rate (tiny fragments), NOT a loss regression: teacher-forced
train/val losses stay good or even improve.

This probe measures exactly that gap for a checkpoint:

* posterior stats over test molecules: mean |mu|, std(mu), mean sigma
  (healthy prior match: |mu| ~ 0, sigma ~ 1 — remember mu is
  tanh-bounded to [-2, 2], so |mu| near 1+ means the posterior is pushed
  into the bounds),
* decode rate + mean heavy-atom count when z comes from the PRIOR vs from
  the POSTERIOR (same conditions, same sampler, T=0.8),

using the scan sampler on CPU or TPU (whatever backend is live) and the
vendored chemistry backend for decoding.

Found via this probe (docs/DESIGN.md "Conditioning-strength study"): a
3-condition model's val_loss-selected ``checkpoint_best`` had prior
decode 0.30 / posterior decode 1.00 (mean |mu| 1.35, sigma 0.37) — but
the SAME run's final-epoch checkpoint probes healthy (prior decode 1.00,
|mu| 0.08). The mismatch is real and the probe detects it, but it lives
at epoch 0: under beta annealing, val_loss (which includes the growing
beta*KL term) is minimized before the anneal bites, and with rich
conditioning the epoch-0 val_loss beats every later epoch, so reference
best-val selection silently ships the pre-anneal model. Remedy:
``--best_metric val_recon`` (cli/train.py), which compares a
beta-independent series.

Usage:
    python benchmarks/prior_mismatch_probe.py \
        --checkpoint /tmp/chemB/ck/checkpoint_best.npz \
        --data /tmp/chem/d.json --properties tpsa,logp,mw
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--properties", default="tpsa")
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--max_length", type=int, default=80)
    ap.add_argument("--temperature", type=float, default=0.8)
    ap.add_argument("--output", default=None,
                    help="optional JSON output path")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin "
                         "overrides JAX_PLATFORMS, so this must go through "
                         "jax.config) — e.g. to probe while the chip is busy")
    # model shape flags (must match checkpoint)
    ap.add_argument("--vocab_size", type=int, default=80)
    ap.add_argument("--embedding_dim", type=int, default=128)
    ap.add_argument("--hidden_dim", type=int, default=256)
    ap.add_argument("--latent_dim", type=int, default=128)
    ap.add_argument("--num_layers", type=int, default=2)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mlx_vae_tpu.config import ModelConfig
    from mlx_vae_tpu.data.metrics import decoded_mols
    from mlx_vae_tpu.data.split import load_and_split
    from mlx_vae_tpu.models.encoder import encoder_apply, reparameterize
    from mlx_vae_tpu.models.sampling import generate_with_temperature
    from mlx_vae_tpu.train.checkpoint import load_checkpoint

    prop_keys = tuple(k.strip() for k in args.properties.split(",")
                      if k.strip())
    mcfg = ModelConfig(vocab_size=args.vocab_size,
                       embedding_dim=args.embedding_dim,
                       hidden_dim=args.hidden_dim, latent_dim=args.latent_dim,
                       num_layers=args.num_layers,
                       num_conditions=len(prop_keys),
                       compute_dtype="bfloat16", use_pallas=False)
    params = load_checkpoint(args.checkpoint)["params"]
    _, _, test_ds, _ = load_and_split(args.data, property_keys=prop_keys)
    with open(args.data) as f:
        alphabet = json.load(f).get("alphabet")
    if not alphabet:
        sys.exit("needs a corpus JSON with an 'alphabet'")

    x = jnp.asarray(test_ds.molecules[:args.batch_size].astype(np.int32))
    cond = jnp.asarray(test_ds.properties_normalized[:args.batch_size],
                       jnp.float32)
    # The test split can be smaller than --batch_size; every per-row
    # array below (x, cond, z_prior, z_post) must share the actual count.
    B = int(x.shape[0])

    mu, logvar = encoder_apply(params["encoder"], mcfg, x, cond)
    sigma = jnp.exp(0.5 * logvar)

    def decode_stats(z, key):
        toks = np.asarray(generate_with_temperature(
            params["decoder"], mcfg, z, cond, key,
            max_length=args.max_length, temperature=args.temperature))
        atoms = [len(mol.atoms) for mol in decoded_mols(toks, alphabet)]
        return (len(atoms) / len(toks),
                float(np.mean(atoms)) if atoms else 0.0)

    z_prior = jax.random.normal(jax.random.PRNGKey(0), (B, mcfg.latent_dim))
    z_post = reparameterize(jax.random.PRNGKey(2), mu, logvar)
    prior_rate, prior_atoms = decode_stats(z_prior, jax.random.PRNGKey(1))
    post_rate, post_atoms = decode_stats(z_post, jax.random.PRNGKey(1))

    out = {
        "checkpoint": args.checkpoint,
        "properties": list(prop_keys),
        "posterior": {"mean_abs_mu": round(float(jnp.abs(mu).mean()), 4),
                      "std_mu": round(float(jnp.std(mu)), 4),
                      "mean_sigma": round(float(sigma.mean()), 4)},
        "prior_z": {"decode_rate": round(prior_rate, 4),
                    "mean_atoms": round(prior_atoms, 2)},
        "posterior_z": {"decode_rate": round(post_rate, 4),
                        "mean_atoms": round(post_atoms, 2)},
    }
    print(json.dumps(out, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
