"""The single training objective.

Composition and the returned 12-key dict match
``/root/reference/complete_vae_loss.py:7-99``::

    total = recon + beta*kl + collapse_penalty + lambda_prop*prop + mi_penalty
    mi_penalty = lambda_mi * max(0, target_mi - MI)

Differences (both deliberate, see SURVEY.md §2.1):

* functional: takes param pytrees + an explicit PRNG key (for
  reparameterization and the teacher-forcing coin flips) instead of stateful
  modules — everything traces into one jitted graph;
* the property-loss wiring is corrected (the reference's call would raise a
  TypeError whenever a predictor existed).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mlx_vae_tpu.config import ModelConfig
from mlx_vae_tpu.losses.info import mutual_information, posterior_collapse
from mlx_vae_tpu.losses.kl import kl_divergence
from mlx_vae_tpu.losses.prop import property_prediction_loss
from mlx_vae_tpu.losses.recon import reconstruction_loss
from mlx_vae_tpu.models.decoder import decoder_apply
from mlx_vae_tpu.models.encoder import encoder_apply, reparameterize
from mlx_vae_tpu.models.predictor import predictor_apply


def complete_vae_loss(
    encoder_params: dict,
    decoder_params: dict,
    predictor_params: Optional[dict],
    cfg: ModelConfig,
    x: jnp.ndarray,
    conditions: jnp.ndarray,
    key,
    beta=0.4,
    lambda_prop: float = 0.1,
    lambda_collapse: float = 0.01,
    teacher_forcing_ratio=0.9,
    free_bits: float = 0.5,
    lambda_mi: float = 0.0,
    target_mi: float = 4.85,
    training: bool = True,
) -> dict:
    k_rep, k_tf, k_drop = jax.random.split(key, 3)

    use_dropout = training and cfg.apply_dropout
    mu, logvar = encoder_apply(encoder_params, cfg, x, conditions,
                               dropout_key=k_drop if use_dropout else None)
    z = reparameterize(k_rep, mu, logvar)

    recon_loss = None
    if cfg.use_pallas and not cfg.reference_zero_state:
        # Fused decoder+CE: logits never leave VMEM (same numerics as the
        # decode->reconstruction_loss path; see ops/pallas_train_decoder.py).
        import jax as _jax
        from mlx_vae_tpu.ops.pallas_train_decoder import (
            decoder_train_ce_pallas, pallas_train_decoder_supported)
        if (pallas_train_decoder_supported(cfg, x.shape[0])
                and _jax.default_backend() == "tpu"):
            from mlx_vae_tpu.models.decoder import hidden_init_row
            cond_f = conditions.astype(jnp.float32)
            L = x.shape[1]
            tf_mask = jax.random.uniform(k_tf, (L,)) < teacher_forcing_ratio
            h_init = hidden_init_row(decoder_params, cfg, z, cond_f)
            ce = decoder_train_ce_pallas(decoder_params, cfg, h_init, cond_f,
                                         x.astype(jnp.int32), False, tf_mask)
            recon_loss = jnp.sum(ce) / (x.shape[0] * L)

    if recon_loss is None:
        logits = decoder_apply(decoder_params, cfg, z, conditions, target_seq=x,
                               teacher_forcing_ratio=teacher_forcing_ratio,
                               key=k_tf)
        recon_loss = reconstruction_loss(logits, x, reduction="mean")
    kl_loss = kl_divergence(mu, logvar, reduction="mean", free_bits=free_bits)
    collapse_penalty = posterior_collapse(mu, logvar, target_mi=target_mi,
                                          weight=lambda_collapse)

    mi = mutual_information(mu, logvar)
    mi_penalty = lambda_mi * jnp.maximum(0.0, target_mi - mi)

    if predictor_params is not None:
        pred_properties = predictor_apply(predictor_params, cfg, z)
        prop_loss = property_prediction_loss(pred_properties, conditions,
                                             reduction="mean")
    else:
        prop_loss = jnp.asarray(0.0, jnp.float32)

    total_loss = (
        recon_loss
        + beta * kl_loss
        + collapse_penalty
        + lambda_prop * prop_loss
        + mi_penalty
    )

    return {
        "total_loss": total_loss,
        "recon_loss": recon_loss,
        "kl_loss": kl_loss,
        "weighted_kl": beta * kl_loss,
        "collapse_penalty": collapse_penalty,
        "prop_loss": prop_loss,
        "weighted_prop_loss": lambda_prop * prop_loss,
        "mutual_info": mi,
        "mi_penalty": mi_penalty,
        "mu": mu,
        "logvar": logvar,
        "z": z,
    }
