"""Adam optimizer + global-norm gradient clipping, jit-native.

The reference uses MLX ``optim.Adam`` whose update rule applies **no bias
correction** (m/(sqrt(v)+eps) directly); ``adam_bias_correction=True`` gives
standard Adam. Two separate optimizer states for encoder and decoder mirror
``/root/reference/trainer.py:74-76``.

Clipping matches ``trainer.py:489-522``: one global L2 norm over the combined
(encoder, decoder) grads, scaled by ``max_norm / (norm + 1e-8)`` only when the
norm exceeds the threshold — here branchless with ``jnp.where`` so it stays
inside the jitted step (the reference syncs the norm to host every batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mlx_vae_tpu.utils.tree import global_norm, tree_zeros_like


def adam_init(params) -> dict:
    return {
        "step": jnp.zeros((), jnp.int32),
        "m": tree_zeros_like(params),
        "v": tree_zeros_like(params),
    }


def adam_update(params, grads, state, lr, b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-8, bias_correction: bool = False):
    """One Adam step. Returns (new_params, new_state)."""
    step = state["step"] + 1
    m = jax.tree_util.tree_map(lambda m_, g: b1 * m_ + (1 - b1) * g,
                               state["m"], grads)
    v = jax.tree_util.tree_map(lambda v_, g: b2 * v_ + (1 - b2) * jnp.square(g),
                               state["v"], grads)
    if bias_correction:
        c1 = 1.0 - b1 ** step.astype(jnp.float32)
        c2 = 1.0 - b2 ** step.astype(jnp.float32)
        new_params = jax.tree_util.tree_map(
            lambda p, m_, v_: p - lr * (m_ / c1) / (jnp.sqrt(v_ / c2) + eps),
            params, m, v)
    else:
        new_params = jax.tree_util.tree_map(
            lambda p, m_, v_: p - lr * m_ / (jnp.sqrt(v_) + eps),
            params, m, v)
    return new_params, {"step": step, "m": m, "v": v}


def clip_by_global_norm(grads_trees: tuple, max_norm: float):
    """Jointly clip a tuple of grad trees. Returns (clipped_trees, norm)."""
    norm = global_norm(*grads_trees)
    scale = jnp.where(norm > max_norm, max_norm / (norm + 1e-8), 1.0)
    clipped = tuple(
        jax.tree_util.tree_map(lambda g: g * scale, t) for t in grads_trees
    )
    return clipped, norm
