#!/usr/bin/env python3
"""Train/val distribution diagnostic.

Capability parity with ``/root/reference/data_diagnostic.py:146-183``:
re-derive the exact seed-67 split, report sizes/shapes/normalization, and
compare untrained losses on a few train vs val batches to localize any
distribution mismatch.
"""

import argparse

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import jax
import jax.numpy as jnp
import numpy as np

from mlx_vae_tpu.config import ModelConfig, TrainConfig
from mlx_vae_tpu.data.prepare import make_synthetic_dataset
from mlx_vae_tpu.data.split import load_and_split
from mlx_vae_tpu.models import ARCVAE
from mlx_vae_tpu.train.steps import eval_step


def avg_loss(params, mcfg, tcfg, ds, n_batches=5):
    losses = []
    key = jax.random.PRNGKey(0)
    for i, (mol, cond) in enumerate(ds.to_batches(32, shuffle=False)):
        if i >= n_batches:
            break
        key, k = jax.random.split(key)
        m = eval_step(params, mcfg, tcfg, jnp.asarray(mol), jnp.asarray(cond),
                      k, jnp.float32(0.05), jnp.float32(0.0))
        losses.append(float(m["total_loss"]))
    return float(np.mean(losses))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None, help="dataset JSON (synthetic if omitted)")
    args = ap.parse_args()

    data_path = args.data
    if data_path is None:
        import tempfile
        tmp = tempfile.NamedTemporaryFile(suffix=".json", delete=False)
        make_synthetic_dataset(n=500, vocab_size=40, max_length=24, path=tmp.name)
        data_path = tmp.name
        print(f"(no --data given; using synthetic dataset at {data_path})")

    train_ds, val_ds, test_ds, raw = load_and_split(data_path)
    print(f"split sizes: train={len(train_ds)} val={len(val_ds)} test={len(test_ds)}")
    print(f"max_length={raw['max_length']} molecules shape={train_ds.molecules.shape}")
    print(f"train norm stats: mean={train_ds.properties_mean.flatten()} "
          f"std={train_ds.properties_std.flatten()}")
    print(f"val normalized props: mean={val_ds.properties_normalized.mean():.3f} "
          f"std={val_ds.properties_normalized.std():.3f} (≈0/≈1 if homogeneous)")

    vocab = int(train_ds.molecules.max()) + 1
    mcfg = ModelConfig(vocab_size=max(vocab, 40), embedding_dim=32, hidden_dim=64,
                       latent_dim=16, num_conditions=1, num_layers=2)
    tcfg = TrainConfig(batch_size=32)
    vae = ARCVAE(mcfg, jax.random.PRNGKey(0))

    tr = avg_loss(vae.params, mcfg, tcfg, train_ds)
    va = avg_loss(vae.params, mcfg, tcfg, val_ds)
    print(f"\nuntrained 5-batch loss: train={tr:.4f} val={va:.4f} "
          f"(|Δ|={abs(tr - va):.4f})")
    if abs(tr - va) > 0.5:
        print("⚠️  train/val diverge before training — check the split/normalization")
    else:
        print("✅ train/val consistent at init")


if __name__ == "__main__":
    main()
