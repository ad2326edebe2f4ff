"""Shared functional layers (param-pytree style).

Parameter naming/layout mirrors MLX modules (``weight [out, in]``, applied as
``x @ W^T + b``) so checkpoints keep the reference's nested-key surface, but
everything here is a pure function over explicit pytrees.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_linear(key, in_features: int, out_features: int, bias: bool = True) -> dict:
    """MLX ``nn.Linear`` init: Uniform(-k, k), k = 1/sqrt(in_features)."""
    kw, kb = jax.random.split(key)
    scale = 1.0 / jnp.sqrt(in_features)
    p = {
        "weight": jax.random.uniform(kw, (out_features, in_features),
                                     minval=-scale, maxval=scale, dtype=jnp.float32)
    }
    if bias:
        p["bias"] = jax.random.uniform(kb, (out_features,),
                                       minval=-scale, maxval=scale, dtype=jnp.float32)
    return p


def linear(params: dict, x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    out = jnp.dot(x.astype(dtype), params["weight"].T.astype(dtype),
                  preferred_element_type=jnp.float32)
    if "bias" in params:
        out = out + params["bias"].astype(jnp.float32)
    return out


def init_embedding(key, num_embeddings: int, dims: int) -> dict:
    """MLX ``nn.Embedding`` init: Normal(0, 1) * dims^-0.5."""
    w = jax.random.normal(key, (num_embeddings, dims), dtype=jnp.float32)
    return {"weight": w * (dims ** -0.5)}


def embedding(params: dict, ids: jnp.ndarray, dtype=jnp.float32,
              onehot: bool = False) -> jnp.ndarray:
    """Token lookup. ``onehot=True`` computes ``one_hot(ids) @ table`` so both
    directions are MXU matmuls — the gather's backward is a scatter-add,
    which inside a per-timestep scan costs one slow scatter per step."""
    w = params["weight"].astype(dtype)
    if onehot:
        oh = jax.nn.one_hot(ids, w.shape[0], dtype=dtype)
        return jnp.dot(oh, w, preferred_element_type=jnp.float32).astype(dtype)
    return w[ids]
