#!/usr/bin/env python3
"""Does co-conditioning on MW repair the TPSA conditioning ceiling? (r5)

`latent_health_sweep.json` + `conditioning_temperature.json` pinned the
0.65 TPSA response-slope ceiling on an uncontrolled SIZE factor: TPSA is
extensive, the decoder tracks polar density with the target but barely
moves molecule size (z is prior noise at generation; EOS couples weakly
to c). The reference's own surface offers a size proxy as a conditioning
axis — molecular weight (`--properties tpsa,mw`). This trains one
2-condition arm (otherwise the sweep's base recipe) and evaluates decoded
TPSA at targets 30/55/90 under two MW policies:

* ``cotarget``: MW set to the corpus-conditional mean for each TPSA
  target (E[mw | tpsa] from the training corpus — the policy a user who
  knows the diagnosis would pick);
* ``mean``: MW pinned at the corpus mean (the naive policy; also the
  control separating "extra axis helps" from "co-targeting helps").

Success = cotarget slope materially above the 1-prop ceiling 0.64-0.67
(latent_health_sweep, 9 arms) with MAE below ~21.

Usage (TPU): python benchmarks/conditioning_mw_cotarget.py \
    --data /tmp/sweep/d450k.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/sweep/d450k.json")
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--fid_batch", type=int, default=2048)
    ap.add_argument("--temperature", type=float, default=0.8)
    ap.add_argument("--targets", type=float, nargs="+",
                    default=[30.0, 55.0, 90.0])
    ap.add_argument("--out_dir", default="/tmp/sweep/ck_mw")
    ap.add_argument("--output",
                    default="benchmarks/conditioning_mw_cotarget.json")
    args = ap.parse_args()

    from mlx_vae_tpu.cli.generate import make_generate_fn
    from mlx_vae_tpu.config import ModelConfig, TrainConfig
    from mlx_vae_tpu.data.metrics import molecule_metrics
    from mlx_vae_tpu.data.split import load_and_split
    from mlx_vae_tpu.models import ARCVAE
    from mlx_vae_tpu.ops.pallas_decoder import pallas_generate_supported
    from mlx_vae_tpu.train.trainer import ARCVAETrainer
    from mlx_vae_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"loading {args.data} (properties tpsa,mw)...", flush=True)
    train_ds, val_ds, test_ds, data = load_and_split(
        args.data, property_keys=("tpsa", "mw"))
    alphabet = data["alphabet"]

    # Corpus-conditional MW policy: E[mw | tpsa within +-10 of target].
    raw_t = np.array([m["tpsa"] for m in data["molecules"]])
    raw_w = np.array([m["mw"] for m in data["molecules"]])
    co_mw = {}
    for t in args.targets:
        sel = np.abs(raw_t - t) < 10.0
        co_mw[t] = float(raw_w[sel].mean())
    print("co-target MW policy:", {k: round(v, 1) for k, v in co_mw.items()},
          flush=True)

    mcfg = ModelConfig(num_conditions=2, compute_dtype="bfloat16",
                       use_pallas=jax.default_backend() == "tpu")
    tcfg = TrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                       learning_rate=5e-4, beta_warmup_epochs=args.epochs,
                       checkpoint_dir=args.out_dir,
                       checkpoint_freq=args.epochs,
                       steps_per_dispatch=4, seed=67)
    vae = ARCVAE(mcfg, jax.random.PRNGKey(67), with_predictor=True)
    trainer = ARCVAETrainer(vae.params, mcfg, tcfg, train_ds)
    trainer.alphabet = alphabet
    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        m = trainer.train_epoch(epoch, args.epochs, val_dataset=val_ds)
        print(f"epoch {epoch + 1}/{args.epochs}: loss={m['train_loss']:.4f} "
              f"val={m['val_loss']:.4f} mi={m['mutual_info']:.3f}",
              flush=True)
    wall = time.perf_counter() - t0
    trainer.save_checkpoint(epoch=args.epochs - 1, is_best=False)
    trainer.join_saves()

    mean = np.asarray(train_ds.properties_mean).ravel()
    std = np.asarray(train_ds.properties_std).ravel()
    fused = pallas_generate_supported(mcfg, args.fid_batch, greedy=False)
    gen = make_generate_fn(mcfg, trainer.params["decoder"], fused, 80,
                           args.temperature, greedy=False)

    results = {}
    for policy in ("cotarget", "mean"):
        rows = []
        for t in args.targets:
            mw = co_mw[t] if policy == "cotarget" else float(raw_w.mean())
            c = jnp.asarray(
                np.tile([[(t - mean[0]) / std[0],
                          (mw - mean[1]) / std[1]]], (args.fid_batch, 1)),
                jnp.float32)
            z = jax.random.normal(jax.random.PRNGKey(0),
                                  (args.fid_batch, mcfg.latent_dim))
            toks = np.asarray(gen(z, c, jax.random.PRNGKey(1))
                              .astype(jnp.uint8))
            mm = molecule_metrics(toks, alphabet, target_tpsa=t,
                                  sample=len(toks))
            rows.append({"target": t, "mw_condition": round(mw, 1),
                         "decode_rate": mm["decoded"] / mm["sampled"],
                         "achieved_mean": mm.get("tpsa_mean"),
                         "achieved_std": mm.get("tpsa_std"),
                         "mae": mm.get("tpsa_mae")})
            print(f"[{policy}] target {t:5.1f} (mw {mw:5.1f}): "
                  f"{rows[-1]['achieved_mean']:6.1f} ± "
                  f"{rows[-1]['achieved_std']:5.1f}  "
                  f"MAE {rows[-1]['mae']:5.1f}", flush=True)
        xs = [r["target"] for r in rows]
        ys = [r["achieved_mean"] for r in rows]
        mx, my = np.mean(xs), np.mean(ys)
        slope = float(np.sum((np.array(xs) - mx) * (np.array(ys) - my))
                      / np.sum((np.array(xs) - mx) ** 2))
        results[policy] = {
            "response_slope": round(slope, 4),
            "mean_mae": round(float(np.mean([r["mae"] for r in rows])), 2),
            "targets": rows,
        }

    out = {
        "study": "2-condition (tpsa, mw) arm vs the 1-prop conditioning "
                 "ceiling: does co-targeting the corpus-consistent MW "
                 "restore the size factor the diagnosis found missing?",
        "baseline_1prop": {"response_slope": "0.64-0.67",
                           "mean_mae": "20.9-21.7",
                           "source": "latent_health_sweep.json (9 arms)"},
        "recipe": f"base sweep recipe, num_conditions=2, {args.epochs}ep, "
                  f"seed 67, T={args.temperature}",
        "train_wall_seconds": round(wall, 1),
        "co_mw_policy": {str(k): round(v, 1) for k, v in co_mw.items()},
        "policies": results,
    }
    Path(args.output).write_text(json.dumps(out, indent=2))
    print(f"\nwrote {args.output}")
    for p, r in results.items():
        print(f"{p}: slope {r['response_slope']:.2f}  MAE {r['mean_mae']}")


if __name__ == "__main__":
    main()
