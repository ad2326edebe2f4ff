#!/usr/bin/env python3
"""Gradient-flow smoke test: run 10 real optimizer steps and assert the
decoder's ``fc_out`` weights actually move.

Capability parity with ``/root/reference/check_decoder_grads.py:81-145``
(10 steps, weight-delta >= 1e-6 per step), on a synthetic dataset since the
ChEMBL blob is absent in both repos.
"""

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
from mlx_vae_tpu.train.optim import adam_init
from mlx_vae_tpu.train.steps import train_step


def main():
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".json") as f:
        make_synthetic_dataset(n=300, vocab_size=40, max_length=24, path=f.name)
        train_ds, _, _, _ = load_and_split(f.name)

    mcfg = ModelConfig(vocab_size=40, embedding_dim=32, hidden_dim=64,
                       latent_dim=16, num_conditions=1, num_layers=2)
    tcfg = TrainConfig(batch_size=32, learning_rate=2e-4)
    vae = ARCVAE(mcfg, jax.random.PRNGKey(0))
    params = vae.params
    opt = {n: adam_init(p) for n, p in params.items()}

    batches = train_ds.to_batches(32, shuffle=False)
    key = jax.random.PRNGKey(1)
    ok = True
    prev_w = np.asarray(params["decoder"]["fc_out"]["weight"]).copy()
    for step, (mol, cond) in enumerate(batches):
        if step >= 10:
            break
        key, k = jax.random.split(key)
        params, opt, m = train_step(params, opt, mcfg, tcfg,
                                    jnp.asarray(mol), jnp.asarray(cond), k,
                                    jnp.float32(0.01), jnp.float32(0.9))
        w = np.asarray(params["decoder"]["fc_out"]["weight"])
        delta = float(np.abs(w - prev_w).max())
        moved = delta >= 1e-6
        ok &= moved
        print(f"step {step}: loss={float(m['total_loss']):.4f} "
              f"max|Δfc_out.weight|={delta:.2e} {'✅' if moved else '❌'}")
        prev_w = w.copy()

    print("\nDecoder gradients flow ✅" if ok else "\nDecoder gradients STUCK ❌")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
