"""KL divergence with free-bits floor.

Numerics match ``/root/reference/losses/kl.py:36-66``: defensive clips
(mu to [-3, 3], logvar to [-6, 3]), per-dim
``KL = -0.5 (1 + logvar - mu^2 - var)`` floored at 0, free-bits floor of
``free_bits / latent_dim`` per dimension, sum over dims, mean/sum over batch.
"""

from __future__ import annotations

import jax.numpy as jnp


def kl_divergence(mu: jnp.ndarray, logvar: jnp.ndarray,
                  reduction: str = "mean", free_bits: float = 0.0) -> jnp.ndarray:
    latent_dim = mu.shape[-1]

    mu = jnp.clip(mu.astype(jnp.float32), -3.0, 3.0)
    logvar = jnp.clip(logvar.astype(jnp.float32), -6.0, 3.0)

    var = jnp.exp(logvar)
    kl_per_dim = -0.5 * (1.0 + logvar - jnp.square(mu) - var)
    kl_per_dim = jnp.maximum(kl_per_dim, 0.0)

    if free_bits > 0.0:
        kl_per_dim = jnp.maximum(kl_per_dim, free_bits / latent_dim)

    kl_per_sample = jnp.sum(kl_per_dim, axis=-1)
    if reduction == "mean":
        return jnp.mean(kl_per_sample)
    if reduction == "sum":
        return jnp.sum(kl_per_sample)
    return kl_per_sample
