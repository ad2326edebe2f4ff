#!/usr/bin/env python3
"""Render latent_health_sweep.json + conditioning_calibrated.json to PNG.

Three panels: (a) split MI per arm against the reference's 4.85 target and
its 1.0 collapse alarm — the levers work; (b) conditioning response slope
per arm — dead flat at ~0.66, the ceiling; (c) achieved vs requested TPSA,
uncalibrated vs calibrated — the shipped request-time fix. CPU-only.

Usage: python benchmarks/latent_health_plot.py
"""

from __future__ import annotations

import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

HERE = Path(__file__).parent
BLUE, ORANGE, GRAY = "#3B6FB6", "#D9782D", "#8a8a8a"
INK, MUTED = "#222222", "#666666"


def main():
    sweep = json.load(open(HERE / "latent_health_sweep.json"))["arms"]
    calib = json.load(open(HERE / "conditioning_calibrated.json"))
    order = ["base", "lat32", "prop1", "coll01", "fb8_mi01_prop0", "mi1",
             "fb8_mi01", "combo", "tmi8"]  # ascending MI, fixed thereafter
    order = [a for a in order if a in sweep]

    fig, axes = plt.subplots(1, 3, figsize=(13, 4.0))
    fig.subplots_adjust(left=0.09, right=0.98, bottom=0.16, top=0.86,
                        wspace=0.3)

    # (a) MI per arm vs the reference's own target
    ax = axes[0]
    mi = [sweep[a]["mutual_information"] for a in order]
    ax.barh(range(len(order)), mi, color=BLUE, height=0.62)
    ax.axvline(4.85, color=INK, lw=1.0, ls="--")
    ax.text(4.95, len(order) - 0.4, "target 4.85", fontsize=8, color=INK)
    ax.axvline(1.0, color=GRAY, lw=1.0, ls=":")
    ax.text(1.1, -0.45, "collapse alarm", fontsize=8, color=MUTED)
    ax.set_yticks(range(len(order)), order, fontsize=8)
    ax.set_xlabel("split mutual information (nats)", fontsize=9)
    ax.set_title("MI is a dial: every strong latent lever\nrepairs it "
                 "(9 arms, 450k corpus, 50 epochs)", fontsize=9.5)
    for i, v in enumerate(mi):
        ax.text(v + 0.08, i, f"{v:.2f}", va="center", fontsize=7.5,
                color=INK)

    # (b) conditioning slope per arm — the ceiling
    ax = axes[1]
    sl = [sweep[a]["conditioning"]["response_slope"] for a in order]
    ax.barh(range(len(order)), sl, color=BLUE, height=0.62)
    ax.axvline(1.0, color=INK, lw=1.0, ls="--")
    ax.text(0.955, -0.45, "ideal 1.0", fontsize=8, color=INK, ha="right")
    ax.set_yticks(range(len(order)), order, fontsize=8)
    ax.set_xlim(0, 1.08)
    ax.set_xlabel("decoded-TPSA response slope (T=0.8)", fontsize=9)
    ax.set_title("Conditioning is a ceiling: slope 0.64–0.67\n"
                 "invariant across ALL arms", fontsize=9.5)
    for i, v in enumerate(sl):
        ax.text(v + 0.015, i, f"{v:.2f}", va="center", fontsize=7.5,
                color=INK)

    # (c) calibration: achieved vs requested target
    ax = axes[2]
    pol = calib["policies"]
    targets = [r["target"] for r in pol["uncalibrated"]["targets"]]
    ax.plot([20, 100], [20, 100], color=GRAY, lw=1.0, ls="--", zorder=1)
    ax.text(96, 99, "ideal", fontsize=8, color=MUTED, ha="right")
    for name, color, marker in (("uncalibrated", BLUE, "o"),
                                ("calibrated", ORANGE, "s")):
        ys = [r["achieved_mean"] for r in pol[name]["targets"]]
        ax.plot(targets, ys, color=color, lw=2, marker=marker, ms=6,
                label=f"{name} (slope {pol[name]['response_slope']:.2f})",
                zorder=3)
    ax.set_xlabel("requested TPSA target", fontsize=9)
    ax.set_ylabel("decoded TPSA (mean of 2048)", fontsize=9)
    ax.set_title("The shipped fix: invert the measured line\n"
                 "(generate.py --calibrate_response A,B)", fontsize=9.5)
    ax.legend(fontsize=8, frameon=False, loc="upper left")

    for ax in axes:
        ax.spines[["top", "right"]].set_visible(False)
        ax.tick_params(labelsize=8)
        ax.grid(axis="x" if ax is not axes[2] else "both", color="#e6e6e6",
                lw=0.6, zorder=0)
        ax.set_axisbelow(True)

    out = HERE / "latent_health_sweep.png"
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
