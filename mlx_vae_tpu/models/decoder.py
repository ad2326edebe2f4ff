"""Autoregressive conditional decoder.

Capability parity with ``MLXAutoregressiveDecoder``
(``/root/reference/models/decoder.py``): per-token generation conditioned on
latent ``z`` (via the initial hidden state, ``decoder.py:76-111``), property
conditions (concatenated to the embedding every step, ``decoder.py:157``) and
previous tokens, with scheduled teacher forcing (batch-global per-timestep
coin flip choosing ground-truth vs argmax feedback, ``decoder.py:180-185``).

TPU-first design: the reference runs a Python loop over timesteps, each
launching ``num_layers`` length-1 LSTM kernels plus a host-side
``np.random.rand()`` **inside** the differentiated loss (``decoder.py:152-185``)
— the #1 perf problem called out in SURVEY.md §3.1. Here the whole loop is one
``lax.scan`` carrying ``(h, c, token)``; teacher forcing is a per-timestep
Bernoulli mask drawn from the JAX PRNG *outside* the scan, selected
branchlessly with ``jnp.where``, so the step compiles once. The argmax
feedback path carries no gradient (ints), matching the reference where
``mx.argmax`` is non-differentiable.

State threading: the reference initializes (h, c) from z+conditions but then
never passes them into its per-step LSTM calls — every timestep runs from
zero state, so z influences *nothing* in the decode
(``decoder.py:143,166-168``; SURVEY.md §2.1 "load-bearing quirk"). The default
here is the *intended* semantics (state carried across steps, init from
``(z_proj + cond_proj)/2``); set ``ModelConfig.reference_zero_state=True`` to
reproduce the quirk bit-for-bit for parity debugging.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mlx_vae_tpu.config import ModelConfig
from mlx_vae_tpu.models.layers import embedding, init_embedding, init_linear, linear
from mlx_vae_tpu.ops.lstm import init_lstm_params, lstm_cell


def init_decoder_params(key, cfg: ModelConfig) -> dict:
    keys = jax.random.split(key, cfg.num_layers + 4)
    params = {
        "z_to_hidden": init_linear(keys[0], cfg.latent_dim, cfg.hidden_dim),
        "condition_to_hidden": init_linear(keys[1], cfg.num_conditions, cfg.hidden_dim),
        "embedding": init_embedding(keys[2], cfg.vocab_size, cfg.embedding_dim),
    }
    for i in range(cfg.num_layers):
        in_size = cfg.embedding_dim + cfg.num_conditions if i == 0 else cfg.hidden_dim
        params[f"lstm_layer_{i}"] = init_lstm_params(keys[3 + i], in_size, cfg.hidden_dim)
    params["fc_out"] = init_linear(keys[3 + cfg.num_layers], cfg.hidden_dim, cfg.vocab_size)
    return params


def hidden_init_row(params: dict, cfg: ModelConfig, z: jnp.ndarray,
                    conditions: jnp.ndarray) -> jnp.ndarray:
    """The shared per-layer initial h ``[B, H]`` = (z_proj + cond_proj)/2
    (reference ``decoder.py:92-109``). Single definition — the scan path,
    both fused-kernel paths, and the loss's monitor reuse it, so the init
    scheme cannot silently diverge between paths."""
    hidden_z = linear(params["z_to_hidden"], z, cfg.dtype)
    hidden_c = linear(params["condition_to_hidden"], conditions, cfg.dtype)
    return (hidden_z + hidden_c) / 2.0


def initialize_hidden_state(params: dict, cfg: ModelConfig, z: jnp.ndarray,
                            conditions: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(h, c) ``[num_layers, B, H]``: h = (z_proj + cond_proj)/2 replicated
    over layers, c = 0 (reference ``decoder.py:76-111``)."""
    hidden_init = hidden_init_row(params, cfg, z, conditions)
    h = jnp.broadcast_to(hidden_init[None], (cfg.num_layers,) + hidden_init.shape)
    return h, jnp.zeros_like(h)


def _stacked_cell(params: dict, cfg: ModelConfig, x: jnp.ndarray,
                  h: jnp.ndarray, c: jnp.ndarray):
    """One timestep through the layer stack. ``h/c [num_layers, B, H]``."""
    new_h, new_c = [], []
    for l in range(cfg.num_layers):
        hl, cl = lstm_cell(params[f"lstm_layer_{l}"], x, h[l], c[l],
                           dtype=cfg.dtype, use_pallas=cfg.use_pallas)
        new_h.append(hl)
        new_c.append(cl)
        x = hl
    return x, jnp.stack(new_h), jnp.stack(new_c)


def decoder_apply(
    params: dict,
    cfg: ModelConfig,
    z: jnp.ndarray,
    conditions: jnp.ndarray,
    target_seq: Optional[jnp.ndarray] = None,
    max_length: int = 80,
    teacher_forcing_ratio=0.5,
    key=None,
) -> jnp.ndarray:
    """Autoregressive decode -> logits ``[B, L, vocab]``.

    With ``target_seq`` given, L = target length and teacher forcing applies;
    otherwise L = ``max_length`` with pure argmax feedback (the reference's
    inference behavior inside ``__call__``, ``decoder.py:137-140``).
    """
    B = z.shape[0]
    cond_f = conditions.astype(jnp.float32)

    if target_seq is not None:
        L = target_seq.shape[1]
        targets_t = jnp.swapaxes(target_seq.astype(jnp.int32), 0, 1)  # [L, B]
        if key is None:
            raise ValueError("decoder_apply with target_seq requires a PRNG key")
        # Batch-global per-timestep coin flips (reference decoder.py:180).
        tf_mask = jax.random.uniform(key, (L,)) < teacher_forcing_ratio

        # Fused Pallas training-decoder path (see ops/pallas_train_decoder.py).
        if (cfg.use_pallas and not cfg.reference_zero_state
                and jax.default_backend() == "tpu"):
            from mlx_vae_tpu.ops.pallas_train_decoder import (
                decoder_train_pallas, pallas_train_decoder_supported)
            if pallas_train_decoder_supported(cfg, B):
                h_init = hidden_init_row(params, cfg, z, cond_f)
                return decoder_train_pallas(params, cfg, h_init, cond_f,
                                            target_seq.astype(jnp.int32),
                                            False, tf_mask)

        # Custom-VJP path for shapes beyond the kernels: bf16 residual
        # storage instead of remat's f32-carry + recompute (decoder_cv.py).
        # Auto-on at H>=768 like the encoder's; the flag forces it. On TPU
        # the backward additionally runs as per-layer fused Pallas kernels
        # (decoder_train_cvp) — the token feedback carries no gradient, so
        # the backward factorizes by layer even though the forward cannot.
        if (not cfg.reference_zero_state
                and (cfg.custom_vjp or cfg.hidden_dim >= 768)):
            from mlx_vae_tpu.ops.decoder_cv import (
                decoder_cvp_supported, decoder_train_cv, decoder_train_cvp)
            h_init = hidden_init_row(params, cfg, z, cond_f)
            if (cfg.use_pallas and jax.default_backend() == "tpu"
                    and decoder_cvp_supported(cfg, B)):
                return decoder_train_cvp(params, cfg, h_init, cond_f,
                                         target_seq.astype(jnp.int32),
                                         tf_mask, False)
            return decoder_train_cv(params, cfg, h_init, cond_f,
                                    target_seq.astype(jnp.int32), tf_mask)
    else:
        L = max_length
        targets_t = jnp.zeros((L, B), jnp.int32)
        tf_mask = jnp.zeros((L,), bool)

    h0, c0 = initialize_hidden_state(params, cfg, z, cond_f)
    token0 = jnp.full((B,), cfg.start_token, jnp.int32)

    def step(carry, xs):
        h, c, token = carry
        tf_t, target_t = xs
        if cfg.reference_zero_state:
            # Reference quirk: every timestep starts from zero LSTM state.
            h_in = jnp.zeros_like(h)
            c_in = jnp.zeros_like(c)
        else:
            h_in, c_in = h, c
        emb = embedding(params["embedding"], token, cfg.dtype,
                        onehot=cfg.embed_onehot)
        x = jnp.concatenate([emb.astype(jnp.float32), cond_f], axis=1)
        out, h_new, c_new = _stacked_cell(params, cfg, x, h_in, c_in)
        logits = linear(params["fc_out"], out, cfg.dtype)
        pred = jnp.argmax(logits, axis=1).astype(jnp.int32)
        next_token = jnp.where(tf_t, target_t, pred)
        return (h_new, c_new, next_token), logits

    if cfg.remat:
        step = jax.checkpoint(step)
    _, logits_t = jax.lax.scan(step, (h0, c0, token0), (tf_mask, targets_t),
                               unroll=min(cfg.scan_unroll, L)
                               if cfg.scan_unroll > 1 else 1)
    return jnp.swapaxes(logits_t, 0, 1)  # [B, L, V]
