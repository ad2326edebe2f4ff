"""Mutual information estimate + posterior-collapse penalty.

Numerics match ``/root/reference/losses/info.py``:
``MI = E_x[KL(q(z|x)||p(z))] - KL(moment-matched aggregate q(z) || p(z))``,
floored at 0. The loss-path estimator takes ``log(mean_var)`` with **no**
epsilon (``info.py:42``); the trainer's monitoring copy adds ``1e-8``
(``/root/reference/trainer.py:568``) — both variants are preserved via
``eps``.
"""

from __future__ import annotations

import jax.numpy as jnp


def mutual_information(mu: jnp.ndarray, logvar: jnp.ndarray,
                       eps: float = 0.0) -> jnp.ndarray:
    mu = jnp.clip(mu.astype(jnp.float32), -3.0, 3.0)
    logvar = jnp.clip(logvar.astype(jnp.float32), -6.0, 3.0)

    var = jnp.exp(logvar)
    kl_per_sample = -0.5 * jnp.sum(1.0 + logvar - jnp.square(mu) - var, axis=1)
    mean_kl = jnp.mean(kl_per_sample)

    mean_mu = jnp.mean(mu, axis=0)
    mean_var = jnp.mean(var, axis=0)
    mean_logvar = jnp.log(mean_var + eps) if eps else jnp.log(mean_var)

    agg_kl = -0.5 * jnp.sum(1.0 + mean_logvar - jnp.square(mean_mu) - mean_var)

    return jnp.maximum(mean_kl - agg_kl, 0.0)


def posterior_collapse(mu: jnp.ndarray, logvar: jnp.ndarray,
                       target_mi: float = 4.85, weight: float = 0.1) -> jnp.ndarray:
    """``weight * max(0, target_mi - MI)`` (reference ``info.py:73-78``)."""
    mi = mutual_information(mu, logvar)
    return weight * jnp.maximum(0.0, target_mi - mi)
