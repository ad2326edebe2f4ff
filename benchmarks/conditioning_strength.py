#!/usr/bin/env python3
"""Consolidate the real-chemistry conditioning-strength study.

Context (docs/DESIGN.md "Real chemistry"): on the drug-like corpus the
conditional decoder compresses toward the corpus TPSA mean (achieved ~=
0.65 * target at 50 epochs / beta 0.05), and latent-space optimization
games the property surrogate without moving decoded chemistry. This study
measures the training-side remedies on the real TPU: longer runs with a
stronger KL/property signal, wider conditioning, and 10x data.

Each arm is a full ``train.py`` run on the chip followed by
``benchmarks/conditioning_fidelity.py --chem`` (decoded Ertl TPSA of 2048
molecules per target, vendored backend) and, optionally,
``benchmarks/prior_mismatch_probe.py`` (aggregate-posterior vs prior
match + prior/posterior decode rates). This script merges the per-arm
JSONs, fits the achieved-vs-target response slope (least squares;
slope 1.0 = perfect conditioning, 0.0 = condition ignored), and writes
``benchmarks/conditioning_strength_study.json``.

Headline finding (full narrative in docs/DESIGN.md "Conditioning-strength
study"): the study's arms must be evaluated at a FIXED epoch, because
under beta annealing the reference's val_loss-selected checkpoint_best
lands on epoch 0 for richly-conditioned configs — the study therefore
records which checkpoint each arm was probed at (``checkpoint=``), and
the B_best/B_final pair quantifies the artifact itself.

Usage:
    python benchmarks/conditioning_strength.py \
        --arm label=A config="50ep b256 beta0.05" fid=/tmp/chemfid_A.json \
              probe=/tmp/probe_A.json checkpoint=best@ep44 \
        --arm label=C config="200ep beta0.2 lambda0.5" fid=/tmp/chemfid_C.json
"""

from __future__ import annotations

import argparse
import json


def fit_slope(rows):
    """Least-squares achieved_mean = a + b * target; returns (a, b)."""
    xs = [r["target"] for r in rows]
    ys = [r["achieved_mean"] for r in rows]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    b = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sxx
    return my - b * mx, b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", action="append", nargs="+", required=True,
                    metavar="key=value",
                    help="one study arm: label=.. config=.. fid=<json path> "
                         "[notes=..]")
    ap.add_argument("--output",
                    default="benchmarks/conditioning_strength_study.json")
    args = ap.parse_args()

    arms = []
    for kvs in args.arm:
        meta = dict(kv.split("=", 1) for kv in kvs)
        rows = json.load(open(meta.pop("fid")))
        intercept, slope = fit_slope(rows)
        arm = {
            "label": meta.pop("label"),
            "config": meta.pop("config"),
            "response_slope": round(slope, 4),
            "response_intercept": round(intercept, 2),
            "mean_mae": round(sum(r["mae"] for r in rows) / len(rows), 2),
            "decode_rate": round(
                sum(r.get("decode_rate", 1.0) for r in rows) / len(rows), 4),
            "targets": rows,
        }
        probe_path = meta.pop("probe", None)
        if probe_path:
            probe = json.load(open(probe_path))
            arm["prior_match"] = {
                "mean_abs_mu": probe["posterior"]["mean_abs_mu"],
                "std_mu": probe["posterior"]["std_mu"],
                "mean_sigma": probe["posterior"]["mean_sigma"],
                "prior_decode_rate": probe["prior_z"]["decode_rate"],
                "posterior_decode_rate": probe["posterior_z"]["decode_rate"],
            }
        arm.update(meta)  # notes, checkpoint, etc.
        arms.append(arm)
        pm = arm.get("prior_match", {})
        prior_dec = (f"prior-dec {pm['prior_decode_rate']:.2f}"
                     if pm else "prior-dec   — ")
        print(f"{arm['label']:>8}  slope {slope:5.2f}  "
              f"MAE {arm['mean_mae']:6.2f}  "
              f"decode {arm['decode_rate']:.2f}  {prior_dec}   "
              f"{arm['config']}")

    out = {
        "study": "real-chemistry conditioning strength (decoded Ertl TPSA "
                 "of generated molecules vs the conditioning target)",
        "protocol": "train.py on TPU -> conditioning_fidelity.py --chem "
                    "(2048 molecules/target, targets 30/55/90, T=0.8, "
                    "vendored-ertl backend)",
        "corpus": "prepare.py --drug_like (TPSA mean 54.9, std 28.8)",
        "arms": arms,
    }
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
