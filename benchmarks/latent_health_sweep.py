#!/usr/bin/env python3
"""Latent-health lever sweep on real chemistry (VERDICT r4 next #1, #8).

Round 4's conditioning-strength study swept beta, property count, epochs,
data size and hidden width — but none of the levers the reference exposes
for the latent-health failure mode it measured (MI 1.03 vs the 4.85 target,
`/root/reference/trainer.py:152`; free-running reconstruction exact-match
0.0). This sweep varies exactly those knobs — ``lambda_mi``
(`/root/reference/losses/info.py:73-78`), ``target_mi``, ``free_bits``
(`/root/reference/losses/kl.py:54-56`), ``lambda_collapse``, and
``latent_dim`` — on the 450k drug-like corpus (arm-D recipe otherwise), and
records per arm:

* latent health on the test split: per-dim KL, active units, the
  monitor-eps MI estimator (``models/latent_eval.latent_statistics``),
* reconstruction fidelity from z = mu: teacher-forced next-token accuracy
  and free-running greedy decode (token accuracy + exact canonical-molecule
  match), each ALSO resolved by sequence position (VERDICT r4 next #8 —
  separates "one early divergence derails the row" from "uniformly wrong"),
* conditioning fidelity: decoded Ertl TPSA of 2048 generated molecules per
  target (30/55/90, T=0.8), response slope + MAE (the round-4 protocol,
  ``benchmarks/conditioning_fidelity.py --chem``),
* the trainer's per-epoch MI monitor curve (the reference's own series,
  `/root/reference/trainer.py:524-575`).

All arms train and evaluate in ONE process so jitted programs are reused
across same-shape arms (the axon relay charges ~2-3 min of server-side
compile per program; 7 arms x ~6 programs re-paid per-process would burn
an hour of chip time on compiles alone).

Usage (TPU, ~10-15 min/arm):
    python -m mlx_vae_tpu.data.prepare --drug_like 450000 --max_length 80 \
        --seed 0 --output /tmp/sweep/d450k.json
    python benchmarks/latent_health_sweep.py --data /tmp/sweep/d450k.json \
        --arms base,fb8_mi01,mi1,tmi8,lat32,coll01,combo
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

# Arm -> overrides. "t:" keys go to TrainConfig, "m:" to ModelConfig.
ARMS = {
    # arm-D replicate: fresh anchor under this exact protocol (round 4
    # measured slope 0.72 / split MI 1.03 on the same corpus + recipe).
    "base": {},
    # the synthetic-corpus winner (docs/DESIGN.md "mitigation_study"):
    # free_bits 8 + lambda_mi 0.1 repaired MI 0.34 -> 5.70 there.
    "fb8_mi01": {"t:free_bits": 8.0, "t:lambda_mi": 0.1},
    # strong MI penalty alone (100x reference weight).
    "mi1": {"t:lambda_mi": 1.0},
    # target lever: push past the reference's 4.85 with a moderate weight.
    "tmi8": {"t:lambda_mi": 0.1, "t:target_mi": 8.0},
    # concentrate capacity: 128 -> 32 dims (per-dim KL floor rises 4x).
    "lat32": {"m:latent_dim": 32},
    # strong posterior-collapse penalty (100x reference weight).
    "coll01": {"t:lambda_collapse": 0.1},
    # interaction: the synthetic winner at concentrated capacity.
    "combo": {"t:free_bits": 8.0, "t:lambda_mi": 0.1, "m:latent_dim": 32},
    # --- conditioning-leakage probes (round-5 diagnosis arms) ---------
    # Hypothesis: conditioning fidelity is capped by TRAIN-TIME LEAKAGE —
    # the decoder can read TPSA from the posterior z (which encodes it)
    # instead of from c, but at generation z is prior noise, so whatever
    # the decoder learned to read from z is lost. Prediction: coupling z
    # to TPSA harder (lambda_prop x10) WORSENS slope/MAE; decoupling it
    # (lambda_prop 0 on the repaired-MI arm) IMPROVES them.
    "prop1": {"t:lambda_prop": 1.0},
    "fb8_mi01_prop0": {"t:free_bits": 8.0, "t:lambda_mi": 0.1,
                       "t:lambda_prop": 0.0},
}


def train_arm(name, overrides, train_ds, val_ds, args, alphabet=None):
    from mlx_vae_tpu.config import ModelConfig, TrainConfig
    from mlx_vae_tpu.models import ARCVAE
    from mlx_vae_tpu.train.trainer import ARCVAETrainer

    mkw = {k[2:]: v for k, v in overrides.items() if k.startswith("m:")}
    tkw = {k[2:]: v for k, v in overrides.items() if k.startswith("t:")}
    mcfg = ModelConfig(compute_dtype="bfloat16",
                       use_pallas=jax.default_backend() == "tpu", **mkw)
    ckdir = str(Path(args.out_dir) / f"ck_{name}")
    # steps_per_dispatch=4: with the device-resident index feed each step
    # is one ~1KB round-trip; 70k steps x 55ms relay RTT would dominate
    # the arm, so fuse 4 steps per dispatched program.
    tcfg = TrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                       learning_rate=5e-4, beta_warmup_epochs=args.epochs,
                       checkpoint_dir=ckdir, checkpoint_freq=args.epochs,
                       steps_per_dispatch=4, seed=67, **tkw)
    vae = ARCVAE(mcfg, jax.random.PRNGKey(67), with_predictor=True)
    trainer = ARCVAETrainer(vae.params, mcfg, tcfg, train_ds)
    trainer.alphabet = alphabet  # stored in checkpoints (serve/generate)

    hist = {k: [] for k in ("val_loss", "val_recon", "val_kl",
                            "mutual_info", "train_loss")}
    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        m = trainer.train_epoch(epoch, args.epochs, val_dataset=val_ds)
        for k in hist:
            hist[k].append(m[k])
        print(f"[{name}] epoch {epoch + 1}/{args.epochs}: "
              f"loss={m['train_loss']:.4f} val={m['val_loss']:.4f} "
              f"val_recon={m['val_recon']:.4f} mi={m['mutual_info']:.3f}",
              flush=True)
    wall = time.perf_counter() - t0
    trainer.save_checkpoint(epoch=args.epochs - 1, is_best=False,
                            best_val_loss=min(hist["val_loss"]))
    trainer.join_saves()
    return trainer.params, mcfg, hist, wall, ckdir


def positional_accuracy(pred, target, pad_token):
    """Pad-masked per-position token accuracy [L] (NaN where a position is
    pad in every row)."""
    mask = target != pad_token
    num = ((pred == target) & mask).sum(axis=0).astype(np.float64)
    den = mask.sum(axis=0).astype(np.float64)
    with np.errstate(invalid="ignore"):
        return np.where(den > 0, num / np.maximum(den, 1), np.nan)


def eval_arm(name, params, mcfg, test_ds, alphabet, args):
    """Latent health + reconstruction (split views + per-position) +
    conditioning fidelity, all from live in-process params.

    Transfer-minimal by design: the relay's bulk bandwidth can dip to
    ~0.1 MB/s, so the eval uploads the test rows ONCE (uint8 tokens),
    keeps mu/logvar on device, computes latent statistics and the
    teacher-forced accuracies device-side (downloads are [L]/[D] vectors
    and scalars), and pulls decoded rows down as uint8."""
    from mlx_vae_tpu.cli.generate import make_generate_fn
    from mlx_vae_tpu.data.metrics import molecule_metrics
    from mlx_vae_tpu.losses.info import mutual_information
    from mlx_vae_tpu.models.decoder import decoder_apply
    from mlx_vae_tpu.models.encoder import encoder_apply
    from mlx_vae_tpu.models.latent_eval import reconstruction_metrics
    from mlx_vae_tpu.ops.pallas_decoder import pallas_generate_supported

    tokens = test_ds.molecules
    cond = test_ds.properties_normalized
    sub = (args.recon_subsample // args.eval_batch) * args.eval_batch
    if sub and len(tokens) > sub:
        tokens, cond = tokens[:sub], cond[:sub]
    n, L = tokens.shape
    B = args.eval_batch
    report = {"num_eval_molecules": int(n)}

    toks_dev = jax.device_put(tokens.astype(np.uint8))
    cond_dev = jax.device_put(cond.astype(np.float32))

    # --- encode (outputs stay on device) --------------------------------
    enc = jax.jit(lambda x, c: encoder_apply(params["encoder"], mcfg,
                                             x.astype(jnp.int32), c))
    mus, lvs = [], []
    for s in range(0, n, B):
        m, lv = enc(toks_dev[s:s + B], cond_dev[s:s + B])
        mus.append(m)
        lvs.append(lv)
    mu, logvar = jnp.concatenate(mus), jnp.concatenate(lvs)

    # --- latent health, device-side -------------------------------------
    def _stats(mu, lv):
        mu32, lv32 = mu.astype(jnp.float32), lv.astype(jnp.float32)
        var = jnp.exp(lv32)
        kl_per_dim = (-0.5 * (1.0 + lv32 - jnp.square(mu32) - var)).mean(0)
        return (kl_per_dim, mu32.var(axis=0),
                mutual_information(mu32, lv32, eps=1e-8))

    kl_per_dim, mu_var, mi = [np.asarray(x)
                              for x in jax.jit(_stats)(mu, logvar)]
    report.update(
        kl_total=float(kl_per_dim.sum()),
        active_units=int((mu_var > 0.01).sum()),
        active_fraction=float((mu_var > 0.01).mean()),
        mutual_information=float(mi),
        kl_per_dim_min=float(kl_per_dim.min()),
        kl_per_dim_max=float(kl_per_dim.max()))

    # --- TF=1 next-token accuracy, per-position sums on device ----------
    key = jax.random.PRNGKey(0)

    def _tf_counts(z, c, x):
        pred = jnp.argmax(
            decoder_apply(params["decoder"], mcfg, z, c,
                          target_seq=x.astype(jnp.int32),
                          teacher_forcing_ratio=1.0, key=key), axis=-1)
        m = x.astype(jnp.int32) != mcfg.pad_token
        hit = jnp.logical_and(pred == x.astype(jnp.int32), m)
        return hit.sum(axis=0), m.sum(axis=0)

    tf_counts = jax.jit(_tf_counts)
    num = np.zeros(L, np.int64)
    den = np.zeros(L, np.int64)
    for s in range(0, n, B):
        h, m = tf_counts(mu[s:s + B], cond_dev[s:s + B], toks_dev[s:s + B])
        num += np.asarray(h)
        den += np.asarray(m)
    report["next_token_accuracy"] = float(num.sum() / max(1, den.sum()))
    with np.errstate(invalid="ignore"):
        tf_pos = np.where(den > 0, num / np.maximum(den, 1), np.nan)

    # --- free-running greedy decode from z = mu (uint8 downloads) -------
    use_fused = pallas_generate_supported(mcfg, B, greedy=True)
    gen = make_generate_fn(mcfg, params["decoder"], use_fused, L, 1.0,
                           greedy=True)
    decoded = np.concatenate([
        np.asarray(gen(mu[s:s + B], cond_dev[s:s + B], key)
                   .astype(jnp.uint8)) for s in range(0, n, B)])
    rec = reconstruction_metrics(decoded, tokens, pad_token=mcfg.pad_token)
    report.update(rec)
    fr_pos = positional_accuracy(decoded[:, :L], tokens, mcfg.pad_token)
    report["positional_accuracy"] = {
        "teacher_forced": np.round(tf_pos, 4).tolist(),
        "free_running": np.round(fr_pos, 4).tolist(),
    }

    # --- conditioning fidelity (round-4 protocol) -----------------------
    mean, std = test_ds.properties_mean, test_ds.properties_std
    fused_s = pallas_generate_supported(mcfg, args.fid_batch, greedy=False)
    sgen = make_generate_fn(mcfg, params["decoder"], fused_s, 80,
                            args.temperature, greedy=False)
    rows = []
    for target in args.targets:
        c = jnp.zeros((args.fid_batch, mcfg.num_conditions), jnp.float32)
        c = c.at[:, 0].set(float((target - mean[0, 0]) / std[0, 0]))
        z = jax.random.normal(jax.random.PRNGKey(0),
                              (args.fid_batch, mcfg.latent_dim))
        toks = np.asarray(sgen(z, c, jax.random.PRNGKey(1))
                          .astype(jnp.uint8))
        mm = molecule_metrics(toks, alphabet, target_tpsa=target,
                              sample=len(toks))
        rows.append({"target": target, "decoded": mm["decoded"],
                     "decode_rate": mm["decoded"] / mm["sampled"],
                     "achieved_mean": mm.get("tpsa_mean"),
                     "achieved_std": mm.get("tpsa_std"),
                     "mae": mm.get("tpsa_mae"),
                     "backend": "vendored-ertl"})
        print(f"[{name}] target {target:5.1f}: achieved "
              f"{rows[-1]['achieved_mean']:6.1f} ± "
              f"{rows[-1]['achieved_std']:5.1f} "
              f"(MAE {rows[-1]['mae']:.1f}, "
              f"decode {rows[-1]['decode_rate']:.2f})", flush=True)

    xs = [r["target"] for r in rows]
    ys = [r["achieved_mean"] for r in rows]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    slope = (sum((x - mx) * (y - my) for x, y in zip(xs, ys))
             / sum((x - mx) ** 2 for x in xs))
    report["conditioning"] = {
        "response_slope": round(slope, 4),
        "mean_mae": round(sum(r["mae"] for r in rows) / len(rows), 2),
        "decode_rate": round(sum(r["decode_rate"] for r in rows)
                             / len(rows), 4),
        "targets": rows,
    }
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/sweep/d450k.json")
    ap.add_argument("--arms", default=",".join(ARMS))
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--eval_batch", type=int, default=1024)
    ap.add_argument("--fid_batch", type=int, default=2048)
    ap.add_argument("--targets", type=float, nargs="+",
                    default=[30.0, 55.0, 90.0])
    ap.add_argument("--temperature", type=float, default=0.8)
    ap.add_argument("--recon_subsample", type=int, default=8192,
                    help="cap the test-split rows used for the latent/recon "
                         "eval (0 = full split; rounded down to a multiple "
                         "of --eval_batch)")
    ap.add_argument("--out_dir", default="/tmp/sweep")
    ap.add_argument("--output", default="benchmarks/latent_health_sweep.json")
    args = ap.parse_args()

    from mlx_vae_tpu.data.split import load_and_split
    from mlx_vae_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    print(f"loading {args.data} ...", flush=True)
    train_ds, val_ds, test_ds, data = load_and_split(
        args.data, property_keys=("tpsa",))
    alphabet = data["alphabet"]
    print(f"splits: train {len(train_ds):,} / val {len(val_ds):,} / "
          f"test {len(test_ds):,}", flush=True)

    out_path = Path(args.output)
    results = {}
    if out_path.exists():  # resume a partial sweep
        results = json.load(open(out_path)).get("arms", {})
        print(f"resuming: {sorted(results)} already done")

    prev_latent = None
    for name in [a for a in args.arms.split(",") if a]:
        if name in results:
            continue
        overrides = ARMS[name]
        this_latent = overrides.get("m:latent_dim", 128)
        if prev_latent is not None and this_latent != prev_latent:
            jax.clear_caches()  # different program shapes; free HBM
        prev_latent = this_latent

        print(f"\n=== arm {name}: {overrides or 'arm-D base recipe'} ===",
              flush=True)
        params, mcfg, hist, wall, ckdir = train_arm(
            name, overrides, train_ds, val_ds, args, alphabet=alphabet)
        report = eval_arm(name, params, mcfg, test_ds, alphabet, args)
        results[name] = {
            "overrides": {k: v for k, v in overrides.items()},
            "train_wall_seconds": round(wall, 1),
            "checkpoint_dir": ckdir,
            "final_val_loss": hist["val_loss"][-1],
            "final_val_recon": hist["val_recon"][-1],
            "final_val_kl": hist["val_kl"][-1],
            "mi_monitor_curve": [round(v, 4) for v in hist["mutual_info"]],
            **report,
        }
        out = {
            "study": "latent-health lever sweep on the 450k drug-like "
                     "corpus (arm-D recipe; levers: lambda_mi, target_mi, "
                     "free_bits, lambda_collapse, latent_dim)",
            "protocol": "in-process train (50ep b256 lr5e-4 beta0->0.05 "
                        "bf16 pallas predictor, seed 67) -> test-split "
                        "latent health + reconstruction from z=mu + "
                        "decoded-TPSA conditioning fidelity "
                        "(2048/target @ 30/55/90, T=0.8, vendored-ertl)",
            "config": {"data": args.data, "epochs": args.epochs,
                       "batch_size": args.batch_size,
                       "recon_subsample": args.recon_subsample},
            "arms": results,
        }
        tmp = str(out_path) + ".tmp"
        out_path.parent.mkdir(parents=True, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(out, f, indent=2)
        os.replace(tmp, out_path)
        c = results[name]["conditioning"]
        print(f"[{name}] DONE in {wall:.0f}s: MI "
              f"{results[name]['mutual_information']:.2f}  AU "
              f"{results[name]['active_units']}  slope "
              f"{c['response_slope']:.2f}  MAE {c['mean_mae']:.1f}  "
              f"exact {100 * results[name]['exact_match']:.1f}%  "
              f"next-tok {100 * results[name]['next_token_accuracy']:.1f}%",
              flush=True)

    print(f"\nsweep complete -> {out_path}")
    for name, r in results.items():
        c = r["conditioning"]
        print(f"{name:>10}  MI {r['mutual_information']:5.2f}  "
              f"AU {r['active_units']:>3}  slope {c['response_slope']:5.2f}  "
              f"MAE {c['mean_mae']:5.1f}  decode {c['decode_rate']:.2f}  "
              f"exact {100 * r['exact_match']:5.1f}%")


if __name__ == "__main__":
    main()
