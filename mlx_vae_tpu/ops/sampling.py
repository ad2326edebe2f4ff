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


def sample_logits(key, logits: jnp.ndarray, temperature: float | jnp.ndarray = 1.0,
                  greedy: bool = False) -> jnp.ndarray:
    """Sample token ids ``[...,]`` from ``logits [..., V]``.

    ``greedy`` is a Python bool (static under jit): the reference path.
    """
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(jnp.asarray(temperature, logits.dtype), 1e-6)
    return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
