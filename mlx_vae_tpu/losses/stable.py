"""Numerical-sanity utilities.

Capability parity with ``/root/reference/losses/stable.py`` (available but not
wired into the main path there either): a host-side sanity checker over loss
scalars/latent bounds and a parameterized-clip KL variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def check_loss_sanity(total_loss, recon_loss, kl_loss, mu, logvar,
                      max_loss: float = 1000.0,
                      max_kl_per_dim: float = 10.0) -> bool:
    """Host-side check mirroring ``stable.py:9-65`` (forces a device sync)."""
    total_val, recon_val, kl_val = (float(jax.device_get(v))
                                    for v in (total_loss, recon_loss, kl_loss))
    if not (np.isfinite(total_val) and np.isfinite(recon_val) and np.isfinite(kl_val)):
        return False
    if total_val > max_loss or total_val < -100:
        return False
    if recon_val < 0 or recon_val > max_loss * 0.9:
        return False
    if kl_val < 0 or kl_val > max_kl_per_dim * mu.shape[1]:
        return False
    mu_val = float(jnp.max(jnp.abs(mu)))
    logvar_max = float(jnp.max(logvar))
    logvar_min = float(jnp.min(logvar))
    if mu_val > 5.0:
        return False
    if logvar_max > 3.0 or logvar_min < -6.0:
        return False
    return True


def kl_divergence_stable(mu, logvar, reduction: str = "mean",
                         free_bits: float = 0.0, mu_clip: float = 3.0,
                         logvar_clip_min: float = -6.0,
                         logvar_clip_max: float = 3.0):
    """Parameterized-clip KL (``stable.py:68-120``)."""
    latent_dim = mu.shape[-1]
    mu = jnp.clip(mu.astype(jnp.float32), -mu_clip, mu_clip)
    logvar = jnp.clip(logvar.astype(jnp.float32), logvar_clip_min, logvar_clip_max)
    var = jnp.exp(logvar)
    kl_per_dim = jnp.maximum(-0.5 * (1.0 + logvar - jnp.square(mu) - var), 0.0)
    if free_bits > 0.0:
        kl_per_dim = jnp.maximum(kl_per_dim, free_bits / latent_dim)
    kl_per_sample = jnp.sum(kl_per_dim, axis=-1)
    if reduction == "mean":
        return jnp.mean(kl_per_sample)
    if reduction == "sum":
        return jnp.sum(kl_per_sample)
    return kl_per_sample
