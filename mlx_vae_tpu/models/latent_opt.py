"""Latent-space property optimization (gradient-based molecular design).

The reference trains a *conditional* VAE but ships no design loop: its
property predictor is never instantiated (``/root/reference/train.py:186``
passes ``property_predictor=None``) and the prediction-loss call is mis-wired
(``/root/reference/complete_vae_loss.py:65`` vs ``losses/prop.py:6-11``), so
the classic "optimize molecules by gradient ascent on a latent property
surrogate" workflow its architecture implies is unreachable there. With the
corrected predictor head (``models/predictor.py``) trained via
``--use_property_predictor``, this module implements that workflow
TPU-natively: the entire optimization is ONE jitted ``lax.scan`` over Adam
updates of a ``[B, latent]`` batch of independent candidates — thousands of
design points descend in parallel through two MXU matmuls per step, with no
host round-trips until the final readback.

Objective, per candidate row ``z``:

    ||predictor(z) - target||^2  +  prior_weight * ||z||^2 / latent_dim

The quadratic prior term keeps optimized points in the region the decoder was
trained on (``z = mu + sigma*eps`` with ``mu`` tanh-bounded to [-2, 2] —
``models/encoder.py``); ``z_clip`` hard-bounds each coordinate the same way
the loss layer defensively clips latents (``losses/kl.py`` mu-clip [-3, 3]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mlx_vae_tpu.config import ModelConfig
from mlx_vae_tpu.models.predictor import predictor_apply


def latent_objective(predictor_params: dict, cfg: ModelConfig,
                     z: jnp.ndarray, target: jnp.ndarray,
                     prior_weight: float = 0.0) -> jnp.ndarray:
    """Per-candidate objective ``[B]`` (lower is better).

    ``target`` is in NORMALIZED property units (z-scored by the train-set
    stats, exactly what the predictor was trained against) and broadcasts
    from ``[C]`` or ``[B, C]``.
    """
    pred = predictor_apply(predictor_params, cfg, z)
    target = jnp.broadcast_to(jnp.asarray(target, jnp.float32), pred.shape)
    mse = jnp.sum((pred - target) ** 2, axis=-1)
    if prior_weight:
        mse = mse + prior_weight * jnp.mean(z ** 2, axis=-1)
    return mse


def optimize_latent(params: dict, cfg: ModelConfig, z0: jnp.ndarray,
                    target: jnp.ndarray, *, steps: int = 300,
                    lr: float = 0.05, prior_weight: float = 0.01,
                    z_clip: float = 3.0):
    """Descend the latent objective from ``z0`` ``[B, latent]``.

    Returns ``(z_opt, info)`` where ``info`` carries the batch-mean
    objective trajectory ``[steps + 1]`` — entry ``t`` is the objective at
    the iterate after ``t`` updates, so ``objective[0]`` is at ``z0`` and
    ``objective[-1]`` is at the returned ``z_opt`` (the scan emits each
    step's PRE-update loss; the final iterate's objective is appended) —
    plus the de-facto before/after predictions (normalized units) for
    reporting. Pure function of its
    inputs — jit it (``steps`` is a trace-time constant) or call it inside
    a larger jitted program. Each candidate row is independent: the summed
    objective makes every per-row gradient identical to optimizing that row
    alone, and plain Adam (bias-corrected; unrelated to the trainer's
    MLX-parity variant in ``train/optim.py``) normalizes per-coordinate.
    """
    if "predictor" not in params:
        raise ValueError(
            "checkpoint has no predictor head — latent optimization needs a "
            "model trained with --use_property_predictor (lambda_prop > 0)")
    pp = params["predictor"]
    z0 = jnp.asarray(z0, jnp.float32)
    b1, b2, eps = 0.9, 0.999, 1e-8

    def total(z):
        return jnp.sum(latent_objective(pp, cfg, z, target, prior_weight))

    def step(carry, _):
        z, m, v, t = carry
        loss, g = jax.value_and_grad(total)(z)
        t = t + 1
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mhat = m / (1 - b1 ** t)
        vhat = v / (1 - b2 ** t)
        z = z - lr * mhat / (jnp.sqrt(vhat) + eps)
        z = jnp.clip(z, -z_clip, z_clip)
        return (z, m, v, t), loss / z.shape[0]

    init = (z0, jnp.zeros_like(z0), jnp.zeros_like(z0),
            jnp.zeros((), jnp.float32))
    (z_opt, _, _, _), traj = jax.lax.scan(step, init, None, length=steps)
    final_obj = jnp.mean(latent_objective(pp, cfg, z_opt, target,
                                          prior_weight))
    info = {
        "objective": jnp.concatenate([traj, final_obj[None]]),
        "pred_init": predictor_apply(pp, cfg, z0),
        "pred_final": predictor_apply(pp, cfg, z_opt),
    }
    return z_opt, info
