"""Stage-wise encoder-only loss (capability parity with
``/root/reference/losses/enc.py:29-42``; exported but unused by the main
training path there too)."""

from __future__ import annotations

from mlx_vae_tpu.losses.kl import kl_divergence
from mlx_vae_tpu.models.encoder import encoder_apply, reparameterize


def encoder_loss(params, cfg, x, conditions, key, beta: float = 1.0,
                 free_bits: float = 0.0):
    """Returns ``(weighted_kl, mu, logvar, z)``."""
    mu, logvar = encoder_apply(params, cfg, x, conditions)
    z = reparameterize(key, mu, logvar)
    kl = kl_divergence(mu, logvar, reduction="mean", free_bits=free_bits)
    return beta * kl, mu, logvar, z
