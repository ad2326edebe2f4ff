#!/usr/bin/env python3
"""Sampling-temperature sweep of conditioning fidelity (round 5).

The latent-health lever sweep (`latent_health_sweep.json`) proved decoded-
TPSA conditioning fidelity is INVARIANT to every training-side latent
lever (slope 0.64-0.67, MAE ~21 across 9 arms): at T=0.8 the conditional
distribution's spread (sigma ~22) dominates MAE, and its mean regresses
toward the corpus prior. The remaining lever is sampling-time sharpening.
This measures it: decoded Ertl TPSA vs target (30/55/90, 2048 molecules
per cell) across temperatures on one checkpoint, reporting per-T response
slope, MAE, decoded sigma, decode rate, and molecule uniqueness (the cost
axis: colder sampling trades diversity).

Usage (TPU):
    python benchmarks/conditioning_temperature.py \
        --checkpoint /tmp/sweep/ck_fb8_mi01/checkpoint_epoch_049.npz \
        --data /tmp/sweep/d450k.json
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
    ap.add_argument("--data", default="/tmp/sweep/d450k.json",
                    help="corpus JSON (alphabet + TPSA normalization stats)")
    ap.add_argument("--temperatures", type=float, nargs="+",
                    default=[0.2, 0.4, 0.6, 0.8, 1.0])
    ap.add_argument("--targets", type=float, nargs="+",
                    default=[30.0, 55.0, 90.0])
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--max_length", type=int, default=80)
    ap.add_argument("--output",
                    default="benchmarks/conditioning_temperature.json")
    args = ap.parse_args()

    from mlx_vae_tpu.cli.generate import make_generate_fn
    from mlx_vae_tpu.config import ModelConfig
    from mlx_vae_tpu.data.metrics import molecule_metrics
    from mlx_vae_tpu.ops.pallas_decoder import pallas_generate_supported
    from mlx_vae_tpu.train.checkpoint import load_checkpoint
    from mlx_vae_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    ck = load_checkpoint(args.checkpoint)
    params = ck["params"]
    corpus = json.load(open(args.data))
    alphabet = corpus["alphabet"]
    stats = ck.get("data_stats") or {}
    if stats.get("properties_mean") is not None:
        mean = float(np.asarray(stats["properties_mean"]).ravel()[0])
        std = float(np.asarray(stats["properties_std"]).ravel()[0])
    else:  # fall back to corpus stats
        t = [m["tpsa"] for m in corpus["molecules"]]
        mean, std = float(np.mean(t)), float(np.std(t))

    mcfg = ModelConfig(compute_dtype="bfloat16",
                       use_pallas=jax.default_backend() == "tpu")
    rows = {}
    for T in args.temperatures:
        fused = pallas_generate_supported(mcfg, args.batch, greedy=False)
        gen = make_generate_fn(mcfg, params["decoder"], fused,
                               args.max_length, T, greedy=False)
        per_target = []
        for target in args.targets:
            c = jnp.zeros((args.batch, mcfg.num_conditions), jnp.float32)
            c = c.at[:, 0].set((target - mean) / std)
            z = jax.random.normal(jax.random.PRNGKey(0),
                                  (args.batch, mcfg.latent_dim))
            toks = np.asarray(gen(z, c, jax.random.PRNGKey(1))
                              .astype(jnp.uint8))
            mm = molecule_metrics(toks, alphabet, target_tpsa=target,
                                  sample=len(toks))
            per_target.append({
                "target": target,
                "decode_rate": mm["decoded"] / mm["sampled"],
                "achieved_mean": mm.get("tpsa_mean"),
                "achieved_std": mm.get("tpsa_std"),
                "mae": mm.get("tpsa_mae"),
                "unique_frac": mm["mol_uniqueness"],
            })
            print(f"T={T:.1f} target {target:5.1f}: "
                  f"{per_target[-1]['achieved_mean']:6.1f} ± "
                  f"{per_target[-1]['achieved_std']:5.1f}  "
                  f"MAE {per_target[-1]['mae']:5.1f}  "
                  f"unique {per_target[-1]['unique_frac']:.3f}", flush=True)
        xs = [r["target"] for r in per_target]
        ys = [r["achieved_mean"] for r in per_target]
        mx, my = np.mean(xs), np.mean(ys)
        slope = float(np.sum((np.array(xs) - mx) * (np.array(ys) - my))
                      / np.sum((np.array(xs) - mx) ** 2))
        rows[f"{T:.1f}"] = {
            "response_slope": round(slope, 4),
            "mean_mae": round(float(np.mean([r["mae"]
                                             for r in per_target])), 2),
            "mean_sigma": round(float(np.mean([r["achieved_std"]
                                               for r in per_target])), 2),
            "mean_unique": round(float(np.mean([r["unique_frac"]
                                                for r in per_target])), 4),
            "mean_decode_rate": round(float(np.mean(
                [r["decode_rate"] for r in per_target])), 4),
            "targets": per_target,
        }

    out = {
        "study": "sampling-temperature sweep of decoded-TPSA conditioning "
                 "fidelity (the sampling-time lever left after "
                 "latent_health_sweep proved training-side invariance)",
        "checkpoint": args.checkpoint,
        "normalization": {"mean": mean, "std": std},
        "temperatures": rows,
    }
    Path(args.output).write_text(json.dumps(out, indent=2))
    print(f"\nwrote {args.output}")
    for T, r in rows.items():
        print(f"T={T}: slope {r['response_slope']:.2f}  "
              f"MAE {r['mean_mae']:5.1f}  sigma {r['mean_sigma']:5.1f}  "
              f"unique {r['mean_unique']:.3f}  "
              f"decode {r['mean_decode_rate']:.3f}")


if __name__ == "__main__":
    main()
