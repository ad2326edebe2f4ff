"""Training history: the 15-series dict, JSON export, and the 2x3 plot grid.

Schema and plot layout match the reference exactly
(``/root/reference/trainer.py:84-100`` for the series,
``trainer.py:605-683`` for JSON + the matplotlib grid with the MI target line
at 4.85 and the collapse line at 1.0).
"""

from __future__ import annotations

import json
from pathlib import Path

HISTORY_KEYS = [
    "epoch",
    "train_loss", "train_recon", "train_kl", "train_collapse", "train_prop",
    "val_loss", "val_recon", "val_kl", "val_collapse", "val_prop",
    "beta", "teacher_forcing", "learning_rate", "mutual_info",
]


def make_history() -> dict:
    return {k: [] for k in HISTORY_KEYS}


def save_history(history: dict, path) -> None:
    history_path = Path(path) / "training_history.json"
    with open(history_path, "w") as f:
        json.dump(history, f, indent=2)
    print(f"    Saved history: {history_path}")


def plot_history(history: dict, save_path=None) -> None:
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("    matplotlib not available for plotting")
        return

    fig, axes = plt.subplots(2, 3, figsize=(15, 10))
    ep = history["epoch"]

    axes[0, 0].plot(ep, history["train_loss"], label="Train")
    axes[0, 0].plot(ep, history["val_loss"], label="Val")
    axes[0, 0].set_xlabel("Epoch"); axes[0, 0].set_ylabel("Total Loss")
    axes[0, 0].legend(); axes[0, 0].set_title("Total Loss")
    axes[0, 0].grid(True, alpha=0.3)

    axes[0, 1].plot(ep, history["train_recon"], label="Recon")
    axes[0, 1].plot(ep, history["train_kl"], label="KL")
    axes[0, 1].set_xlabel("Epoch"); axes[0, 1].set_ylabel("Loss")
    axes[0, 1].legend(); axes[0, 1].set_title("Loss Components")
    axes[0, 1].grid(True, alpha=0.3)

    axes[0, 2].plot(ep, history["train_collapse"], label="Collapse Penalty")
    axes[0, 2].set_xlabel("Epoch"); axes[0, 2].set_ylabel("Penalty")
    axes[0, 2].legend(); axes[0, 2].set_title("Posterior Collapse Penalty")
    axes[0, 2].grid(True, alpha=0.3)

    axes[1, 0].plot(ep, history["train_prop"], label="Train")
    axes[1, 0].plot(ep, history["val_prop"], label="Val")
    axes[1, 0].set_xlabel("Epoch"); axes[1, 0].set_ylabel("Property Loss")
    axes[1, 0].legend(); axes[1, 0].set_title("Property Prediction Loss")
    axes[1, 0].grid(True, alpha=0.3)

    axes[1, 1].plot(ep, history["beta"], label="Beta")
    ax2 = axes[1, 1].twinx()
    ax2.plot(ep, history["teacher_forcing"], label="TF Ratio", color="orange")
    axes[1, 1].set_xlabel("Epoch")
    axes[1, 1].set_ylabel("Beta", color="blue")
    ax2.set_ylabel("TF Ratio", color="orange")
    axes[1, 1].set_title("Annealing Schedules")
    axes[1, 1].grid(True, alpha=0.3)

    axes[1, 2].plot(ep, history["mutual_info"], label="MI")
    axes[1, 2].axhline(y=4.85, color="r", linestyle="--", label="Target")
    axes[1, 2].axhline(y=1.0, color="orange", linestyle="--", label="Collapse")
    axes[1, 2].set_xlabel("Epoch"); axes[1, 2].set_ylabel("Mutual Information")
    axes[1, 2].legend(); axes[1, 2].set_title("Latent Space Health")
    axes[1, 2].grid(True, alpha=0.3)

    plt.tight_layout()
    if save_path:
        plt.savefig(save_path, dpi=150)
        print(f"    Saved plot: {save_path}")
    plt.close(fig)
