#!/usr/bin/env python3
"""Bulk conditional generation CLI.

The reference exposes generation only as ``ARCVAE.generate`` (no CLI). This
implements BASELINE.json config 5: bulk TPSA-targeted generation (up to 1M
molecules) via the jitted batched sampler, chunked to a device-friendly batch,
with SELFIES decoding and validity reporting.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="Generate molecules from a trained AR-CVAE")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Path to a .npz checkpoint (e.g. checkpoints/checkpoint_best.npz)")
    p.add_argument("--data", type=str, default=None,
                   help="Dataset JSON (for property normalization stats + alphabet)")
    p.add_argument("--num_molecules", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=4096)
    p.add_argument("--max_length", type=int, default=80)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--greedy", action="store_true",
                   help="Argmax decoding (the reference's behavior)")
    p.add_argument("--target", type=float, nargs="+", default=[90.0],
                   help="Target property value(s), raw units (e.g. TPSA 90)")
    p.add_argument("--output", type=str, default="generated.json")
    # Model shape flags (must match the checkpoint)
    p.add_argument("--vocab_size", type=int, default=80)
    p.add_argument("--embedding_dim", type=int, default=128)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--latent_dim", type=int, default=128)
    p.add_argument("--num_conditions", type=int, default=1)
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    return p


def main(argv=None):
    from mlx_vae_tpu.config import ModelConfig
    from mlx_vae_tpu.data.prepare import selfies_validity, decode_tokens
    from mlx_vae_tpu.models.sampling import generate_with_temperature
    from mlx_vae_tpu.train.checkpoint import load_checkpoint

    args = build_parser().parse_args(argv)

    mcfg = ModelConfig(
        vocab_size=args.vocab_size, embedding_dim=args.embedding_dim,
        hidden_dim=args.hidden_dim, latent_dim=args.latent_dim,
        num_conditions=args.num_conditions, num_layers=args.num_layers,
        compute_dtype=args.compute_dtype,
    )
    ckpt = load_checkpoint(args.checkpoint)
    dec_params = ckpt["params"]["decoder"]

    # Normalize the raw target properties with train-set stats if available.
    mean = np.zeros((1, args.num_conditions), np.float32)
    std = np.ones((1, args.num_conditions), np.float32)
    alphabet = None
    if args.data and Path(args.data).exists():
        from mlx_vae_tpu.data.split import load_and_split
        train_ds, _, _, data = load_and_split(
            args.data, property_keys=tuple(["tpsa", "logp", "mw"][: args.num_conditions]))
        mean, std = train_ds.properties_mean, train_ds.properties_std
        alphabet = data.get("alphabet")

    target = (np.asarray(args.target, np.float32)[None, :] - mean) / std

    gen = jax.jit(generate_with_temperature,
                  static_argnames=("cfg", "max_length", "greedy"))

    key = jax.random.PRNGKey(0)
    all_tokens = []
    batch_times = []  # first entry includes XLA compile; excluded from rate
    remaining = args.num_molecules
    while remaining > 0:
        # fixed-shape batches (last one padded) => exactly one compile
        b = min(args.batch_size, remaining)
        key, kz, kg = jax.random.split(key, 3)
        z = jax.random.normal(kz, (args.batch_size, mcfg.latent_dim), jnp.float32)
        cond = jnp.broadcast_to(jnp.asarray(target),
                                (args.batch_size, args.num_conditions))
        t0 = time.perf_counter()
        toks = gen(dec_params, mcfg, z, cond, kg, max_length=args.max_length,
                   temperature=args.temperature, greedy=args.greedy)
        toks = np.asarray(toks)
        batch_times.append(time.perf_counter() - t0)
        all_tokens.append(toks[:b])
        remaining -= b
    tokens = np.concatenate(all_tokens)[: args.num_molecules]

    steady = batch_times[1:] or batch_times
    rate = args.batch_size * len(steady) / sum(steady)
    dt = sum(batch_times)
    validity = selfies_validity(tokens, alphabet or [])
    print(f"Generated {len(tokens):,} molecules in {dt:.2f}s "
          f"({rate:,.0f} mols/sec steady-state; first batch includes compile)")
    print(f"Validity: {100 * validity:.1f}%")

    out = {
        "tokens": tokens.tolist(),
        "mols_per_sec": rate,
        "validity": validity,
        "temperature": args.temperature,
        "target": args.target,
    }
    if alphabet:
        out["selfies"] = [decode_tokens(t, alphabet) for t in tokens[:1000]]
    with open(args.output, "w") as f:
        json.dump(out, f)
    print(f"Saved {args.output}")


if __name__ == "__main__":
    main()
