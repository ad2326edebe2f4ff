"""ARCVAE facade.

API parity with the reference facade (``/root/reference/models/vae.py:8-131``):
``__call__(x, conditions, ...) -> (logits, mu, logvar, z)`` and
``generate(batch_size, conditions, max_length, temperature) -> tokens``.

Unlike the reference — whose facade owns three stateful modules, including a
*separate, unshared* sampling decoder (``vae.py:52-59``) — this facade is a
thin convenience wrapper over the functional core: it holds one param pytree
(``{"encoder": ..., "decoder": ...[, "predictor": ...]}``), jits the forward
and generation paths once, and threads explicit PRNG keys.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from mlx_vae_tpu.config import ModelConfig
from mlx_vae_tpu.models.decoder import decoder_apply, init_decoder_params
from mlx_vae_tpu.models.encoder import encoder_apply, init_encoder_params, reparameterize
from mlx_vae_tpu.models.predictor import init_predictor_params
from mlx_vae_tpu.models.sampling import generate_with_temperature


@functools.partial(jax.jit, static_argnames=("cfg",))
def vae_forward(params: dict, cfg: ModelConfig, x, conditions, key,
                teacher_forcing_ratio=0.5):
    """encode -> reparameterize -> decode-with-TF. Returns (logits, mu, logvar, z)."""
    k_rep, k_tf = jax.random.split(key)
    mu, logvar = encoder_apply(params["encoder"], cfg, x, conditions)
    z = reparameterize(k_rep, mu, logvar)
    logits = decoder_apply(params["decoder"], cfg, z, conditions,
                           target_seq=x, teacher_forcing_ratio=teacher_forcing_ratio,
                           key=k_tf)
    return logits, mu, logvar, z


@functools.partial(jax.jit, static_argnames=("cfg", "max_length", "greedy",
                                             "top_k", "top_p"))
def vae_generate(params: dict, cfg: ModelConfig, conditions, key,
                 max_length: int = 80, temperature=1.0, greedy: bool = False,
                 top_k: int = 0, top_p: float = 1.0):
    """Sample z ~ N(0, I) and decode (reference ``vae.py:101-131``).

    Uses the fused Pallas generation kernel on supported TPU shapes
    (``ops/pallas_decoder.py``), the scan sampler otherwise. ``top_k`` /
    ``top_p`` truncation (an extension beyond the reference's
    temperature-only surface) runs in-kernel on supported shapes too
    (bisection masking, ``ops/sampling.py:truncate_logits_bisect``).
    """
    k_z, k_gen = jax.random.split(key)
    B = conditions.shape[0]
    z = jax.random.normal(k_z, (B, cfg.latent_dim), jnp.float32)
    if cfg.use_pallas:
        from mlx_vae_tpu.ops.pallas_decoder import (
            pallas_generate, pallas_generate_supported)
        if pallas_generate_supported(cfg, B, greedy=greedy,
                                     top_k=top_k, top_p=top_p):
            return pallas_generate(params["decoder"], cfg, z, conditions,
                                   k_gen, max_length=max_length,
                                   temperature=temperature, greedy=greedy,
                                   top_k=top_k, top_p=top_p)
    return generate_with_temperature(params["decoder"], cfg, z, conditions,
                                     k_gen, max_length=max_length,
                                     temperature=temperature, greedy=greedy,
                                     top_k=top_k, top_p=top_p)


class ARCVAE:
    def __init__(self, cfg: ModelConfig, key=None, with_predictor: bool = False):
        self.cfg = cfg
        self.latent_dim = cfg.latent_dim
        key = key if key is not None else jax.random.PRNGKey(0)
        k_enc, k_dec, k_pred = jax.random.split(key, 3)
        self.params = {
            "encoder": init_encoder_params(k_enc, cfg),
            "decoder": init_decoder_params(k_dec, cfg),
        }
        if with_predictor:
            self.params["predictor"] = init_predictor_params(k_pred, cfg)

    def __call__(self, x, conditions, key,
                 teacher_forcing_ratio: float = 0.5
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        return vae_forward(self.params, self.cfg, x, conditions, key,
                           teacher_forcing_ratio)

    def generate(self, batch_size: int, conditions, key,
                 max_length: int = 80, temperature: float = 1.0,
                 greedy: bool = False, top_k: int = 0,
                 top_p: float = 1.0) -> jnp.ndarray:
        conditions = jnp.asarray(conditions, jnp.float32)
        assert conditions.shape[0] == batch_size
        return vae_generate(self.params, self.cfg, conditions, key,
                            max_length=max_length, temperature=temperature,
                            greedy=greedy, top_k=top_k, top_p=top_p)
