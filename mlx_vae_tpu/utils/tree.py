"""Pytree helpers.

The reference walks nested MLX parameter dicts by hand
(``/root/reference/trainer.py:489-522,714-736``); here the same operations are
one-line ``jax.tree_util`` maps that stay inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def global_norm(*trees) -> jnp.ndarray:
    """L2 norm over every leaf of every tree (one fused reduction).

    Matches the reference's global-norm computation over the (encoder,
    decoder) grads tuple (``/root/reference/trainer.py:501-509``).
    """
    leaves = []
    for t in trees:
        leaves.extend(jax.tree_util.tree_leaves(t))
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves))


def tree_scale(tree, scale):
    return jax.tree_util.tree_map(lambda l: l * scale, tree)


def tree_zeros_like(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def tree_to_numpy(tree):
    """Device pytree -> nested dict of numpy arrays (for .npz checkpoints)."""
    return jax.tree_util.tree_map(lambda l: np.asarray(jax.device_get(l)), tree)


def tree_from_numpy(tree):
    """Nested dict of numpy arrays -> device pytree."""
    return jax.tree_util.tree_map(jnp.asarray, tree)
