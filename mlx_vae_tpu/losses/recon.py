"""Token cross-entropy reconstruction loss.

Numerics match the reference (``/root/reference/losses/recon.py:29-62``):
stable log-softmax (max-subtract), gather of target log-probs, ``-log p``
reduced by mean/sum. Deliberately **no pad masking** — pad positions count in
the mean, exactly as in the reference (SURVEY.md §2.1), so loss curves are
comparable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reconstruction_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                        reduction: str = "mean") -> jnp.ndarray:
    """``logits [B, L, V]``, ``targets [B, L] int`` -> scalar (or ``[B*L]``)."""
    V = logits.shape[-1]
    logits_flat = logits.reshape(-1, V).astype(jnp.float32)
    targets_flat = targets.reshape(-1).astype(jnp.int32)

    log_softmax = jax.nn.log_softmax(logits_flat, axis=-1)
    target_log_probs = jnp.take_along_axis(
        log_softmax, targets_flat[:, None], axis=1
    )[:, 0]
    ce = -target_log_probs

    if reduction == "mean":
        return jnp.mean(ce)
    if reduction == "sum":
        return jnp.sum(ce)
    return ce
