#!/usr/bin/env python3
"""Latent-space interpolation between two molecules.

The classic VAE qualitative probe — encode two molecules, walk the latent
path between them, decode every waypoint — and a capability the reference's
architecture implies (a continuous latent space is the README's stated
point, ``/root/reference/README.md:7-10``) but ships no code for. Pairs with
``encode.py`` (which extracts the endpoints' latents) and ``optimize.py``
(which steers latents by gradient instead of geometry).

TPU shape: both endpoint encodes and ALL waypoint decodes run as single
jitted batched calls — the whole walk is two device programs, not
per-waypoint dispatches. Decoding is greedy (deterministic: the path, not
sampler noise, is what's being visualized); conditions are linearly
interpolated between the endpoints' own normalized properties.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(
        description="Decode the latent path between two dataset molecules")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--data", type=str, required=True,
                   help="Dataset JSON the endpoint molecules come from")
    p.add_argument("--split", choices=["train", "val", "test"],
                   default="test", help="Split the indices refer to")
    p.add_argument("--index_a", type=int, default=0,
                   help="Row index of the first endpoint in the split")
    p.add_argument("--index_b", type=int, default=1,
                   help="Row index of the second endpoint in the split")
    p.add_argument("--steps", type=int, default=9,
                   help="Waypoints including both endpoints (>= 2)")
    p.add_argument("--mode", choices=["slerp", "lerp"], default="slerp",
                   help="Spherical (norm-preserving) or straight-line path")
    p.add_argument("--output", type=str, default="interpolation.json")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    from mlx_vae_tpu.utils.compile_cache import add_cache_flags
    add_cache_flags(p)
    return p


def main(argv=None):
    from mlx_vae_tpu.cli.generate import infer_model_shape, make_generate_fn
    from mlx_vae_tpu.config import ModelConfig
    from mlx_vae_tpu.data.prepare import decode_tokens, selfies_validity
    from mlx_vae_tpu.data.split import load_and_split
    from mlx_vae_tpu.models.encoder import encoder_apply
    from mlx_vae_tpu.models.latent_eval import latent_path
    from mlx_vae_tpu.ops.pallas_decoder import pallas_generate_supported
    from mlx_vae_tpu.train.checkpoint import load_checkpoint

    parser = build_parser()
    args = parser.parse_args(argv)
    from mlx_vae_tpu.utils.compile_cache import setup_cache_from_args
    setup_cache_from_args(args)
    if args.steps < 2:
        parser.error(f"--steps must be >= 2, got {args.steps}")

    ckpt = load_checkpoint(args.checkpoint)
    params = ckpt["params"]
    mcfg = ModelConfig(compute_dtype=args.compute_dtype,
                       use_pallas=jax.default_backend() == "tpu",
                       **infer_model_shape(params["decoder"]))

    train_ds, val_ds, test_ds, data = load_and_split(
        args.data,
        property_keys=tuple(["tpsa", "logp", "mw"][:mcfg.num_conditions]))
    ds = {"train": train_ds, "val": val_ds, "test": test_ds}[args.split]
    for name in ("index_a", "index_b"):
        idx = getattr(args, name)
        if not 0 <= idx < len(ds):
            parser.error(f"--{name} {idx} out of range for the "
                         f"{len(ds)}-molecule {args.split} split")
    alphabet = data.get("alphabet")

    rows = np.stack([ds.molecules[args.index_a], ds.molecules[args.index_b]])
    conds = np.stack([ds.properties_normalized[args.index_a],
                      ds.properties_normalized[args.index_b]])
    L = rows.shape[1]

    mu, _ = jax.jit(lambda x, c: encoder_apply(params["encoder"], mcfg, x, c))(
        jnp.asarray(rows), jnp.asarray(conds))
    mu = np.asarray(mu)

    z_path = latent_path(mu[0], mu[1], args.steps, mode=args.mode)
    t = np.linspace(0.0, 1.0, args.steps)[:, None].astype(np.float32)
    cond_path = (1 - t) * conds[0] + t * conds[1]

    use_fused = pallas_generate_supported(mcfg, args.steps, greedy=True)
    gen = make_generate_fn(mcfg, params["decoder"], use_fused, L, 1.0,
                           greedy=True)
    tokens = np.asarray(gen(jnp.asarray(z_path), jnp.asarray(cond_path),
                            jax.random.PRNGKey(0)))

    validity = selfies_validity(tokens, alphabet or [])
    distinct = len({row.tobytes() for row in tokens})
    print(f"Interpolated {args.steps} steps ({args.mode}) between "
          f"{args.split}[{args.index_a}] and {args.split}[{args.index_b}]: "
          f"{distinct} distinct decodes, validity {100 * validity:.1f}%")
    if alphabet:
        for i, row in enumerate(tokens):
            print(f"  t={t[i, 0]:.2f}  {decode_tokens(row, alphabet)}")

    out = {
        "mode": args.mode,
        "steps": args.steps,
        "split": args.split,
        "indices": [args.index_a, args.index_b],
        "tokens": tokens.tolist(),
        "z_path": z_path.tolist(),
        "validity": validity,
        "distinct_decodes": distinct,
        "endpoint_tokens": rows.tolist(),
    }
    if alphabet:
        out["selfies"] = [decode_tokens(row, alphabet) for row in tokens]
        out["endpoint_selfies"] = [decode_tokens(r, alphabet) for r in rows]
    with open(args.output, "w") as f:
        json.dump(out, f)
    print(f"Saved {args.output}")


if __name__ == "__main__":
    main()
