"""LSTM ops, TPU-first.

The reference leans on MLX's single-layer ``nn.LSTM`` called per layer (and,
in the decoder, per *timestep* from Python —
``/root/reference/models/decoder.py:152-185``). Here the recurrence is a
``lax.scan`` compiled once, and the input-side projection of the whole
sequence is hoisted out of the scan into one large MXU matmul
(``x @ Wx^T`` over ``[B*L, in] @ [in, 4H]``), leaving only the ``h @ Wh^T``
recurrent matmul inside the loop.

Parameter layout mirrors MLX ``nn.LSTM`` naming for checkpoint-surface parity:
``{"Wx": [4H, in], "Wh": [4H, H], "bias": [4H]}``, gate order (i, f, g, o),
update ``c' = σ(f)·c + σ(i)·tanh(g)``, ``h' = σ(o)·tanh(c')``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def init_lstm_params(key, input_size: int, hidden_size: int) -> dict:
    """Uniform(-k, k) with k = 1/sqrt(hidden_size), matching MLX nn.LSTM init."""
    k1, k2, k3 = jax.random.split(key, 3)
    scale = 1.0 / jnp.sqrt(hidden_size)
    return {
        "Wx": jax.random.uniform(k1, (4 * hidden_size, input_size),
                                 minval=-scale, maxval=scale, dtype=jnp.float32),
        "Wh": jax.random.uniform(k2, (4 * hidden_size, hidden_size),
                                 minval=-scale, maxval=scale, dtype=jnp.float32),
        "bias": jax.random.uniform(k3, (4 * hidden_size,),
                                   minval=-scale, maxval=scale, dtype=jnp.float32),
    }


def lstm_gates(gates: jnp.ndarray, c: jnp.ndarray,
               use_pallas: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Elementwise LSTM gate update from pre-activation ``gates [..., 4H]``.

    Returns ``(h_new, c_new)``. With ``use_pallas`` the fused Pallas kernel
    (one VMEM pass over the gates; custom VJP) is used when shapes allow.
    """
    if use_pallas:
        from mlx_vae_tpu.ops.pallas_lstm import fused_lstm_gates, pallas_supported
        # Compiled Mosaic kernels need a real TPU; elsewhere fall through to
        # the jnp path (tests exercise the kernel via interpret mode).
        if pallas_supported(gates.shape, c.shape) and jax.default_backend() == "tpu":
            return fused_lstm_gates(gates, c)
    h = c.shape[-1]
    i = jax.nn.sigmoid(gates[..., :h])
    f = jax.nn.sigmoid(gates[..., h : 2 * h])
    g = jnp.tanh(gates[..., 2 * h : 3 * h])
    o = jax.nn.sigmoid(gates[..., 3 * h :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def _combined_weight(params: dict, dtype) -> jnp.ndarray:
    """``[in + H, 4H]`` fused input+recurrent weight.

    One ``[x, h] @ W`` matmul per step beats two separate matmuls, and —
    measured on v5e — beats the classic "hoist x@Wx out of the scan" trick by
    ~50x for fwd+bwd: hoisting materializes a ``[B*L, 4H]`` f32 activation
    (and its cotangent) in HBM, which at 4H = 4x input width is pure
    bandwidth waste. Loop-invariant, so XLA hoists the concat/cast out of the
    scan.
    """
    return jnp.concatenate([params["Wx"].T, params["Wh"].T], axis=0).astype(dtype)


def lstm_cell(params: dict, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray,
              dtype=jnp.float32, use_pallas: bool = False):
    """One LSTM step: ``x [B, in]``, ``h/c [B, H]`` -> ``(h', c')``."""
    w = _combined_weight(params, dtype)
    inp = jnp.concatenate([x.astype(dtype), h.astype(dtype)], axis=1)
    gates = jnp.dot(inp, w, preferred_element_type=jnp.float32) \
        + params["bias"].astype(jnp.float32)
    return lstm_gates(gates, c, use_pallas=use_pallas)


def lstm_sequence(params: dict, xs: jnp.ndarray, h0: jnp.ndarray, c0: jnp.ndarray,
                  dtype=jnp.float32, use_pallas: bool = False, unroll: int = 1,
                  remat: bool = False):
    """Full-sequence LSTM: ``xs [B, L, in]`` -> ``(outputs [B, L, H], (h, c))``.

    One fused ``[x_t, h] @ W`` matmul + gate update per scan step; gate
    pre-activations live only in VMEM/registers (see ``_combined_weight``).
    With ``remat`` the step is ``jax.checkpoint``-ed: the backward re-derives
    gates from the (h, c) carries instead of storing ``[B, 4H]`` residuals
    per step.
    """
    L = xs.shape[1]
    w = _combined_weight(params, dtype)
    bias = params["bias"].astype(jnp.float32)
    xs_t = jnp.swapaxes(xs, 0, 1)  # [L, B, in] — scan over leading axis

    def step(carry, x_t):
        h, c = carry
        inp = jnp.concatenate([x_t.astype(dtype), h.astype(dtype)], axis=1)
        gates = jnp.dot(inp, w, preferred_element_type=jnp.float32) + bias
        h, c = lstm_gates(gates, c, use_pallas=use_pallas)
        return (h, c), h

    if remat:
        step = jax.checkpoint(step)
    (h, c), hs = jax.lax.scan(step, (h0, c0), xs_t,
                              unroll=min(unroll, L) if unroll > 1 else 1)
    return jnp.swapaxes(hs, 0, 1), (h, c)


# --------------------------------------------------------------------------
# Custom-VJP sequence LSTM: hoisted-backward weight gradients.
#
# Autodiff of the scan accumulates dW with one small matmul per timestep
# (``inp_t^T @ dgates_t``), which runs the MXU at a fraction of peak and
# dominates the train step. This formulation stores per-step gate
# pre-activations in the forward, runs a *light* reverse scan that only
# threads the (dh, dc) chain (one [B,4H]x[4H,H] matmul per step) while
# emitting dgates, and then computes
#     dWcat = inp_all^T @ dgates_all,  dxs = dgates_all @ Wx
# as two LARGE matmuls over the flattened [L*B, .] axes — near-peak MXU work
# instead of L tiny accumulations. Measured ~2x faster fwd+bwd than the
# autodiff scan on v5e.
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def lstm_sequence_cv(params: dict, xs: jnp.ndarray, h0: jnp.ndarray,
                     c0: jnp.ndarray, dtype=jnp.float32,
                     use_pallas: bool = False):
    """Drop-in ``lstm_sequence`` with the hand-written backward above."""
    (hs, hc), _ = _seq_cv_fwd(params, xs, h0, c0, dtype, use_pallas)
    return hs, hc


def _seq_cv_fwd(params, xs, h0, c0, dtype, use_pallas):
    w = _combined_weight(params, dtype)
    bias = params["bias"].astype(jnp.float32)
    xs_t = jnp.swapaxes(xs, 0, 1)
    store_dtype = dtype

    def step(carry, x_t):
        h, c = carry
        inp = jnp.concatenate([x_t.astype(dtype), h.astype(dtype)], axis=1)
        gates = jnp.dot(inp, w, preferred_element_type=jnp.float32) + bias
        h2, c2 = lstm_gates(gates, c, use_pallas=use_pallas)
        return (h2, c2), (h2, c2, gates.astype(store_dtype))

    (hf, cf), (hs_t, cs_t, gates_t) = jax.lax.scan(step, (h0, c0), xs_t)
    residuals = (params, xs, hs_t, cs_t, gates_t, h0, c0)
    return (jnp.swapaxes(hs_t, 0, 1), (hf, cf)), residuals


def _seq_cv_bwd(dtype, use_pallas, residuals, cotangents):
    params, xs, hs_t, cs_t, gates_t, h0, c0 = residuals
    dhs, (dhf, dcf) = cotangents
    L, B, H = hs_t.shape
    I = xs.shape[-1]

    dhs_t = jnp.swapaxes(dhs, 0, 1)  # [L, B, H]
    h_prev_t = jnp.concatenate([h0[None], hs_t[:-1]], axis=0)
    c_prev_t = jnp.concatenate([c0[None], cs_t[:-1]], axis=0)
    wh = params["Wh"].astype(dtype)  # [4H, H]

    def bstep(carry, step_in):
        dh, dc = carry
        gates, c_prev, c_t, dh_out = step_in
        g = gates.astype(jnp.float32)
        i = jax.nn.sigmoid(g[:, :H])
        f = jax.nn.sigmoid(g[:, H:2 * H])
        gg = jnp.tanh(g[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(g[:, 3 * H:])
        tc = jnp.tanh(c_t)
        dh_total = dh + dh_out
        dc_tot = dc + dh_total * o * (1.0 - tc * tc)
        dgates = jnp.concatenate([
            dc_tot * gg * i * (1.0 - i),
            dc_tot * c_prev * f * (1.0 - f),
            dc_tot * i * (1.0 - gg * gg),
            dh_total * tc * o * (1.0 - o),
        ], axis=1)
        dh_prev = jnp.dot(dgates.astype(dtype), wh,
                          preferred_element_type=jnp.float32)
        dc_prev = dc_tot * f
        return (dh_prev, dc_prev), dgates.astype(dtype)

    (dh0, dc0), dgates_t = jax.lax.scan(
        bstep, (dhf, dcf), (gates_t, c_prev_t, cs_t, dhs_t), reverse=True)

    # The heavy gradients as single large matmuls over [L*B, .].
    dg = dgates_t.reshape(L * B, 4 * H)
    xs_flat = jnp.swapaxes(xs, 0, 1).reshape(L * B, I).astype(dtype)
    hprev_flat = h_prev_t.reshape(L * B, H).astype(dtype)

    dWx = jnp.dot(dg.T, xs_flat, preferred_element_type=jnp.float32)
    dWh = jnp.dot(dg.T, hprev_flat, preferred_element_type=jnp.float32)
    dbias = jnp.sum(dg.astype(jnp.float32), axis=0)
    dxs_t = jnp.dot(dg, params["Wx"].astype(dtype),
                    preferred_element_type=jnp.float32)  # [L*B, I]
    # custom_vjp contract: cotangent dtype must match the primal input's —
    # an uncast f32 dxs against bf16 xs poisons upstream strict-dtype
    # transpose rules (e.g. inter-layer dropout's div; same fix as
    # ops/pallas_seq_lstm._bwd_rule).
    dxs = jnp.swapaxes(dxs_t.reshape(L, B, I), 0, 1).astype(xs.dtype)

    dparams = {"Wx": dWx, "Wh": dWh, "bias": dbias}
    return dparams, dxs, dh0, dc0


def _seq_cv_fwd_rule(params, xs, h0, c0, dtype, use_pallas):
    out, residuals = _seq_cv_fwd(params, xs, h0, c0, dtype, use_pallas)
    return out, residuals


lstm_sequence_cv.defvjp(_seq_cv_fwd_rule, _seq_cv_bwd)
