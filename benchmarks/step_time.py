#!/usr/bin/env python3
"""Train-step time for an arbitrary model config (TPU measurement harness).

The numbers in docs/DESIGN.md's tables come from this: min of N trials of a
pipelined dispatch chain forced by a scalar readback (single measurements
through the relay-tunneled backend are 10-60x noise — see DESIGN.md
"Measurement").

Usage:
  timeout 560 python benchmarks/step_time.py --hidden 1024 --layers 4 \
      --batch 2048 [--custom_vjp] [--no_pallas] [--trials 3] [--steps 24]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mlx_vae_tpu.config import ModelConfig, TrainConfig
from mlx_vae_tpu.models import ARCVAE
from mlx_vae_tpu.train.optim import adam_init
from mlx_vae_tpu.train.steps import train_step


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hidden", type=int, default=1024)
    p.add_argument("--latent", type=int, default=512)
    p.add_argument("--embedding", type=int, default=128)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--seq_len", type=int, default=64)
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--custom_vjp", action="store_true")
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--trace", default=None,
                   help="capture a jax.profiler trace of a few steps here")
    args = p.parse_args()

    mcfg = ModelConfig(hidden_dim=args.hidden, latent_dim=args.latent,
                       embedding_dim=args.embedding, num_layers=args.layers,
                       compute_dtype=args.compute_dtype,
                       use_pallas=not args.no_pallas,
                       custom_vjp=args.custom_vjp)
    tcfg = TrainConfig(batch_size=args.batch)
    log(f"devices={jax.devices()} cfg={mcfg}")

    vae = ARCVAE(mcfg, jax.random.PRNGKey(0))
    params = vae.params
    opt = {name: adam_init(p_) for name, p_ in params.items()}

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, mcfg.vocab_size,
                                 (args.batch, args.seq_len)), jnp.int32)
    cond = jnp.asarray(rng.normal(size=(args.batch, mcfg.num_conditions)),
                       jnp.float32)
    beta = jnp.float32(0.05)
    tf = jnp.float32(0.9)
    key = jax.random.PRNGKey(1)

    # Warmup / compile
    t0 = time.perf_counter()
    key, k = jax.random.split(key)
    params, opt, m = train_step(params, opt, mcfg, tcfg, x, cond, k, beta, tf)
    loss = float(m["total_loss"])
    log(f"compile+first step {time.perf_counter() - t0:.1f}s loss={loss:.4f}")
    assert np.isfinite(loss)

    best = float("inf")
    for trial in range(args.trials):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            key, k = jax.random.split(key)
            params, opt, m = train_step(params, opt, mcfg, tcfg, x, cond, k,
                                        beta, tf)
        loss = float(m["total_loss"])  # forces the chain
        dt = (time.perf_counter() - t0) / args.steps
        log(f"trial {trial}: {dt * 1e3:.1f}ms/step loss={loss:.4f}")
        best = min(best, dt)

    toks = args.batch * args.seq_len / best
    print(f"step_time_ms={best * 1e3:.1f} tokens_per_sec={toks:,.0f}")

    if args.trace:
        from mlx_vae_tpu.utils.profiler import trace
        with trace(args.trace):
            for _ in range(3):
                key, k = jax.random.split(key)
                params, opt, m = train_step(params, opt, mcfg, tcfg, x, cond,
                                            k, beta, tf)
            float(m["total_loss"])
        log(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
