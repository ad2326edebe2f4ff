#!/usr/bin/env python3
"""Measure what --bidirectional / --apply_dropout actually cost the encoder.

Both flags disable the whole-stack fused encoder kernel
(``ops/pallas_encoder.py`` — its per-timestep inter-layer dataflow cannot
express a reverse direction or inter-layer dropout), falling back to the
per-layer fused kernels (``ops/pallas_seq_lstm.py``) inside the layer loop.
VERDICT r3 weak #4 called this a silent regression; ``models/encoder.py``
now prints a trace-time notice, and THIS script pins the number the notice
points at.

Four encoder fwd+bwd variants at the default-model shape (H=256/2L, B=1024,
L=64, bf16), timed with the scalar-readback pattern (``bench.py``):

1. ``fused_stack``     — unidirectional, whole-stack kernel (production)
2. ``per_layer``       — same model, stack gate forced off: isolates the
                         whole-stack kernel's value at equal FLOPs
3. ``bidirectional``   — inherent per-layer + a reverse LSTM per layer
                         (~2x LSTM FLOPs + 2H inter-layer widths)
4. ``apply_dropout``   — per-layer + inter-layer dropout masks

Writes ``benchmarks/encoder_fallback_cost.json``.
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def measure(cfg, params, tokens, cond, dropout_key,
            trials: int = 6, reps: int = 8) -> float:
    from mlx_vae_tpu.models.encoder import encoder_apply

    @jax.jit
    def step(params, tokens, cond, key):
        def loss(p):
            mu, logvar = encoder_apply(p, cfg, tokens, cond,
                                       dropout_key=key)
            return jnp.sum(mu * mu) + jnp.sum(logvar * logvar)

        l, g = jax.value_and_grad(loss)(params)
        return l + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

    # compile + 3 warm executions: through the relay the first real
    # execution can stall ~1 min server-side (docs/DESIGN.md
    # "Persistent compilation cache")
    for _ in range(3):
        step(params, tokens, cond, dropout_key).block_until_ready()
    # min over several timed trials: DESIGN.md "Measurement-noise warning" —
    # a single relay hiccup inside one timed region inflates a mean 10-60x
    # (observed: 64ms for a step the full-trainer profile pins at ~3ms)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(reps):
            acc = acc + step(params, tokens, cond, dropout_key)
        float(acc)  # scalar force
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    if jax.default_backend() != "tpu":
        print("requires a TPU backend")
        return 2

    from unittest import mock

    from mlx_vae_tpu.config import ModelConfig
    from mlx_vae_tpu.models.encoder import init_encoder_params
    from mlx_vae_tpu.ops import pallas_encoder

    B, L = 1024, 64
    base = dict(hidden_dim=256, num_layers=2, compute_dtype="bfloat16",
                use_pallas=True)
    variants = {
        "fused_stack": ModelConfig(**base),
        "per_layer": ModelConfig(**base),  # gate mocked off below
        "bidirectional": ModelConfig(bidirectional=True, **base),
        "apply_dropout": ModelConfig(apply_dropout=True, dropout=0.2, **base),
    }
    tokens = jax.random.randint(jax.random.PRNGKey(0), (B, L), 0, 80)
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, 1), jnp.float32)
    dk = jax.random.PRNGKey(2)

    results = {"shape": {"B": B, "L": L, **base}}
    for name, cfg in variants.items():
        params = init_encoder_params(jax.random.PRNGKey(3), cfg)
        ctx = (mock.patch.object(pallas_encoder, "pallas_encoder_supported",
                                 return_value=False)
               if name == "per_layer" else _null_ctx())
        with ctx:
            dt = measure(cfg, params, tokens, cond,
                         dk if name == "apply_dropout" else None)
        results[name] = {"step_ms": dt * 1e3}
        print(f"{name}: {dt * 1e3:.2f} ms/step")

    fused = results["fused_stack"]["step_ms"]
    for name in ("per_layer", "bidirectional", "apply_dropout"):
        results[name]["vs_fused_stack"] = results[name]["step_ms"] / fused
    out = Path(__file__).parent / "encoder_fallback_cost.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")
    return 0


def _null_ctx():
    import contextlib
    return contextlib.nullcontext()


if __name__ == "__main__":
    sys.exit(main())
