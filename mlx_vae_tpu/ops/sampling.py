"""Token sampling ops.

Upgrades the reference's inference sampling, which scales logits by
temperature, softmaxes, then takes **argmax** — leaving a
"TODO: implement proper categorical sampling"
(``/root/reference/models/decoder_sampling.py:110-117``), so temperature has
no effect there. Here ``sample_logits`` does real Gumbel/categorical sampling
via ``jax.random.categorical``; ``greedy=True`` reproduces the reference's
argmax behavior exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def truncate_logits(scaled: jnp.ndarray, top_k: int = 0,
                    top_p: float = 1.0) -> jnp.ndarray:
    """Mask ``scaled [..., V]`` outside the top-k / nucleus support to -inf.

    ``top_k``/``top_p`` are static Python values; the defaults return the
    input unchanged (no ops traced). Nucleus keeps the smallest
    descending-probability prefix whose cumulative mass reaches ``top_p``
    (the crossing token is included, so the set is never empty); both
    filters together intersect. Factored out of :func:`sample_logits` so
    the kept-set can be oracle-checked directly.
    """
    if top_k and top_k > 0 and top_k < scaled.shape[-1]:
        kth = jax.lax.top_k(scaled, top_k)[0][..., -1:]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
    if top_p < 1.0:
        desc = jnp.flip(jnp.sort(scaled, axis=-1), axis=-1)
        probs = jax.nn.softmax(desc, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens whose cumulative mass *before* them is < top_p; the
        # crossing token is therefore included and the set is non-empty.
        kept = cum - probs < top_p
        cutoff = jnp.min(jnp.where(kept, desc, jnp.inf), axis=-1, keepdims=True)
        scaled = jnp.where(scaled < cutoff, -jnp.inf, scaled)
    return scaled


def sample_logits(key, logits: jnp.ndarray, temperature: float | jnp.ndarray = 1.0,
                  greedy: bool = False, top_k: int = 0,
                  top_p: float = 1.0) -> jnp.ndarray:
    """Sample token ids ``[...,]`` from ``logits [..., V]``.

    ``greedy``, ``top_k`` and ``top_p`` are Python values (static under
    jit); the defaults (``0`` / ``1.0``) trace the exact same program as
    before they existed, so they are bitwise no-ops. Truncation is an
    extension beyond the reference's temperature-only surface:

    * ``top_k > 0``: restrict sampling to the ``k`` highest logits
      (after temperature scaling).
    * ``top_p < 1.0``: nucleus sampling — restrict to the smallest set of
      tokens whose cumulative probability reaches ``top_p`` (the token
      that crosses the threshold is kept, so the set is never empty).

    Both applied together intersect (the usual top-k-then-top-p order).
    Valid ranges (checked host-side — the values are static): ``top_k >= 0``
    and ``0 < top_p <= 1``; ``top_p = 0`` would leave an empty support set.
    """
    if top_k < 0:
        raise ValueError(f"top_k must be >= 0 (0 disables), got {top_k}")
    if not 0.0 < top_p <= 1.0:
        raise ValueError(f"top_p must be in (0, 1] (1.0 disables), got {top_p}")
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(jnp.asarray(temperature, logits.dtype), 1e-6)
    scaled = truncate_logits(scaled, top_k=top_k, top_p=top_p)
    return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
