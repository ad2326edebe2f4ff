#!/usr/bin/env python3
"""Standalone sign/shape sanity checks on random tensors.

Capability parity with ``/root/reference/test_loss_signs.py`` (run by hand,
prints ✅/❌ per check) — with its ``property_prediction_loss`` mis-call bug
fixed (the reference's step 5 would crash; SURVEY.md §4). The real test suite
lives in ``tests/``; this is the quick console diagnostic.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import jax
import jax.numpy as jnp

from mlx_vae_tpu.losses import (
    kl_divergence,
    mutual_information,
    posterior_collapse,
    property_prediction_loss,
    reconstruction_loss,
)


def check(name, cond, detail=""):
    print(f"{'✅' if cond else '❌'} {name} {detail}")
    return bool(cond)


def main():
    key = jax.random.PRNGKey(67)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    B, L, V, D = 8, 20, 40, 16

    logits = jax.random.normal(k1, (B, L, V))
    targets = jax.random.randint(k2, (B, L), 0, V)
    mu = jax.random.normal(k3, (B, D)) * 0.5
    logvar = jax.random.normal(k4, (B, D)) * 0.3 - 1.0

    ok = True
    r = reconstruction_loss(logits, targets)
    ok &= check("reconstruction_loss > 0", float(r) > 0, f"(= {float(r):.4f})")

    kl = kl_divergence(mu, logvar, free_bits=0.5)
    ok &= check("kl_divergence >= free_bits", float(kl) >= 0.5, f"(= {float(kl):.4f})")

    mi = mutual_information(mu, logvar)
    ok &= check("mutual_information >= 0", float(mi) >= 0, f"(= {float(mi):.4f})")

    pc = posterior_collapse(mu, logvar, target_mi=4.85, weight=0.1)
    ok &= check("posterior_collapse >= 0", float(pc) >= 0, f"(= {float(pc):.4f})")

    pred = jax.random.normal(k5, (B, 3))
    target_props = jnp.zeros((B, 3))
    pl = property_prediction_loss(pred, target_props)
    ok &= check("property_prediction_loss > 0 (corrected signature)",
                float(pl) > 0, f"(= {float(pl):.4f})")

    print("\nAll checks passed ✅" if ok else "\nSome checks FAILED ❌")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
