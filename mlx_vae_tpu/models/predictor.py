"""Property predictor head: z -> predicted properties.

The reference leaves this as a TODO (``/root/reference/train.py:186`` passes
``property_predictor=None``) and its loss call is mis-wired (missing required
argument — ``/root/reference/complete_vae_loss.py:65`` vs
``losses/prop.py:6-11``). Here the head exists and the wiring is corrected,
enabling BASELINE.json config 3 (multi-property conditioning with property
prediction loss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mlx_vae_tpu.config import ModelConfig
from mlx_vae_tpu.models.layers import init_linear, linear


def init_predictor_params(key, cfg: ModelConfig) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "fc_hidden": init_linear(k1, cfg.latent_dim, cfg.hidden_dim),
        "fc_out": init_linear(k2, cfg.hidden_dim, cfg.num_conditions),
    }


def predictor_apply(params: dict, cfg: ModelConfig, z: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.relu(linear(params["fc_hidden"], z, cfg.dtype))
    return linear(params["fc_out"], h, cfg.dtype)
