#!/usr/bin/env python3
"""Latent-space molecular design CLI.

Gradient-based property optimization: draw a batch of latent candidates from
the prior, descend ``||predictor(z) - target||^2`` (plus a quadratic prior
term) with a jitted in-scan Adam (``models/latent_opt.py``), then decode the
optimized latents. An extension beyond the reference surface — its predictor
path is dead code (``/root/reference/train.py:186`` passes ``None``; the loss
call at ``complete_vae_loss.py:65`` is mis-wired) — enabled here by the
corrected head trained with ``--use_property_predictor``.

Compared to plain conditional generation (``generate.py``), this steers each
INDIVIDUAL candidate until the surrogate agrees with the target, rather than
relying on the decoder's average conditioning fidelity; the two compose (the
decoder still receives the target as its condition input).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(
        description="Optimize latent candidates toward target properties, "
                    "then decode them")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Path to a .npz checkpoint trained with "
                        "--use_property_predictor")
    p.add_argument("--data", type=str, default=None,
                   help="Dataset JSON (for property normalization stats + "
                        "alphabet)")
    p.add_argument("--target", type=float, nargs="+", default=[90.0],
                   help="Target property value(s), raw units (e.g. TPSA 90)")
    p.add_argument("--num_molecules", type=int, default=1024)
    p.add_argument("--opt_steps", type=int, default=300,
                   help="Adam steps of latent descent")
    p.add_argument("--opt_lr", type=float, default=0.05)
    p.add_argument("--prior_weight", type=float, default=0.01,
                   help="Weight of the ||z||^2/latent_dim prior term that "
                        "keeps candidates in-distribution")
    p.add_argument("--z_clip", type=float, default=3.0,
                   help="Per-coordinate hard bound on z during descent")
    p.add_argument("--max_length", type=int, default=80)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--top_k", type=int, default=0)
    p.add_argument("--top_p", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output", type=str, default="optimized.json")
    p.add_argument("--no_normalize", action="store_true",
                   help="Treat --target as already-normalized model units")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    from mlx_vae_tpu.utils.compile_cache import add_cache_flags
    add_cache_flags(p)
    return p


def main(argv=None):
    from mlx_vae_tpu.cli.common import (normalized_targets,
                                        resolve_property_stats)
    from mlx_vae_tpu.cli.generate import infer_model_shape, make_generate_fn
    from mlx_vae_tpu.config import ModelConfig
    from mlx_vae_tpu.data.prepare import decode_tokens, selfies_validity
    from mlx_vae_tpu.models.latent_opt import optimize_latent
    from mlx_vae_tpu.ops.pallas_decoder import pallas_generate_supported
    from mlx_vae_tpu.train.checkpoint import load_checkpoint

    parser = build_parser()
    args = parser.parse_args(argv)
    from mlx_vae_tpu.utils.compile_cache import setup_cache_from_args
    setup_cache_from_args(args)
    if args.opt_steps < 1:
        parser.error(f"--opt_steps must be >= 1, got {args.opt_steps}")
    if args.top_k < 0:
        parser.error(f"--top_k must be >= 0 (0 disables), got {args.top_k}")
    if not 0.0 < args.top_p <= 1.0:
        parser.error(f"--top_p must be in (0, 1], got {args.top_p}")

    ckpt = load_checkpoint(args.checkpoint)
    params = ckpt["params"]
    if "predictor" not in params:
        raise SystemExit(
            "ERROR: this checkpoint has no property-predictor head — latent "
            "optimization needs one. Re-train with --use_property_predictor "
            "(and lambda_prop > 0) so the z->properties surrogate exists.")

    mcfg = ModelConfig(compute_dtype=args.compute_dtype,
                       use_pallas=jax.default_backend() == "tpu",
                       **infer_model_shape(params["decoder"]))
    mean, std, alphabet, _ = resolve_property_stats(
        args.data, args.no_normalize, ckpt, mcfg.num_conditions)
    target = normalized_targets(args.target, mean, std, mcfg.num_conditions)

    B = args.num_molecules
    key = jax.random.PRNGKey(args.seed)
    kz, kg = jax.random.split(key)
    z0 = jax.random.normal(kz, (B, mcfg.latent_dim), jnp.float32)

    opt = jax.jit(lambda z: optimize_latent(
        params, mcfg, z, jnp.asarray(target),
        steps=args.opt_steps, lr=args.opt_lr,
        prior_weight=args.prior_weight, z_clip=args.z_clip))
    t0 = time.perf_counter()
    z_opt, info = opt(z0)
    obj = np.asarray(info["objective"])
    dt_opt = time.perf_counter() - t0
    print(f"Optimized {B:,} candidates x {args.opt_steps} steps in "
          f"{dt_opt:.2f}s (objective {obj[0]:.4f} -> {obj[-1]:.4f}, "
          f"compile included)")

    # De-normalized surrogate predictions, before vs after.
    pred0 = np.asarray(info["pred_init"]) * std + mean
    pred1 = np.asarray(info["pred_final"]) * std + mean
    for c in range(mcfg.num_conditions):
        print(f"  property {c}: target {args.target[c]:.2f} | predicted "
              f"{pred0[:, c].mean():.2f}+-{pred0[:, c].std():.2f} -> "
              f"{pred1[:, c].mean():.2f}+-{pred1[:, c].std():.2f}")

    use_fused = pallas_generate_supported(mcfg, B, greedy=args.greedy,
                                          top_k=args.top_k, top_p=args.top_p)
    if use_fused:
        print("Using fused Pallas generation kernel")
    gen = make_generate_fn(mcfg, params["decoder"], use_fused,
                           args.max_length, args.temperature, args.greedy,
                           top_k=args.top_k, top_p=args.top_p)
    cond = jnp.broadcast_to(jnp.asarray(target), (B, mcfg.num_conditions))
    tokens = np.asarray(gen(z_opt, cond, kg))
    validity = selfies_validity(tokens, alphabet or [])
    # Uniqueness matters here specifically: descent pulls every candidate
    # toward the same surrogate optimum, so mode collapse of the decoded
    # set is THE failure mode to watch (raise prior_weight / lower steps).
    from mlx_vae_tpu.data.metrics import uniqueness
    uniq = uniqueness(tokens)
    print(f"Decoded {B:,} optimized molecules; validity "
          f"{100 * validity:.1f}%, uniqueness {100 * uniq:.1f}%")

    out = {
        "tokens": tokens.tolist(),
        "z_optimized": np.asarray(z_opt).tolist(),
        "target": args.target,
        "opt_steps": args.opt_steps,
        "opt_lr": args.opt_lr,
        "prior_weight": args.prior_weight,
        "objective_first": float(obj[0]),
        "objective_final": float(obj[-1]),
        "predicted_before_mean": pred0.mean(axis=0).tolist(),
        "predicted_after_mean": pred1.mean(axis=0).tolist(),
        "validity": validity,
        "uniqueness": uniq,
        "temperature": args.temperature,
    }
    if alphabet:
        out["selfies"] = [decode_tokens(t, alphabet) for t in tokens[:1000]]
    with open(args.output, "w") as f:
        json.dump(out, f)
    print(f"Saved {args.output}")


if __name__ == "__main__":
    main()
