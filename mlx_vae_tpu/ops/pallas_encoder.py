"""Fused Pallas encoder stack: embedding + N LSTM layers in ONE kernel pair.

The encoder consumes the token sequence through ``num_layers`` stacked LSTMs
and pools ONLY the last timestep of the top layer
(``/root/reference/models/encoder.py:106``). Round 1 fused each layer
separately (``ops/pallas_seq_lstm.py``), which still streams every
inter-layer activation sequence through HBM twice (write in layer l's
forward, read in layer l+1's) and pays per-kernel dispatch 2n times.

This module runs the WHOLE stack in one forward kernel — the token
embedding as a one-hot matmul against a VMEM-resident table (the gather's
backward would be a scatter; one-hot makes both directions MXU work), every
layer's cell per timestep with stacked VMEM-resident weights (the decoder
kernel's scheme, ``ops/pallas_train_decoder.py``) — and one reverse-time
backward kernel that accumulates ALL weight gradients (every layer + the
embedding table) in VMEM. The only HBM traffic is the token stream in and
the per-layer residuals (h, c, gates) out.

The single output is ``h_top[:, L-1]`` — the pooled feature — so the
backward receives exactly one cotangent ``[B, H]`` injected at the final
timestep and runs the pure (dh, dc) chains backward; no per-step output
cotangent stream exists at all.

Supported: non-bidirectional, no inter-layer dropout, lane-aligned dims,
and the measured v5e VMEM budget (see ``pallas_train_decoder._VMEM_BUDGET``);
callers fall back to the per-layer kernels / scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mlx_vae_tpu.ops.pallas_train_decoder import (
    _VMEM_BUDGET,
    _acts,
    _split_acts,
    _block_rows,
    _round_up,
)


def _vmem_estimate(cfg, BB: int) -> int:
    H, E, n = cfg.hidden_dim, cfg.embedding_dim, cfg.num_layers
    Vp = _round_up(cfg.vocab_size, 128)
    K0 = _round_up(E, 128)
    wb = 2 if cfg.compute_dtype == "bfloat16" else 4
    nr = max(n - 1, 1)
    weights = ((K0 + H) * 4 * H + nr * 2 * H * 4 * H + Vp * E) * wb
    dW = ((K0 + H) * 4 * H + nr * 2 * H * 4 * H + Vp * E + n * 4 * H) * 4
    streams = 2 * (4 * n * BB * H * wb + n * BB * 4 * H * wb)
    scratch = 2 * n * BB * H * 4
    return weights + dW + streams + scratch


def _fwd_frame_bytes(cfg, BB: int) -> int:
    """Estimated VMEM frame of the forward kernel (weights + out blocks +
    scratch), for the raise-the-limit decision below."""
    H, E, n = cfg.hidden_dim, cfg.embedding_dim, cfg.num_layers
    Vp = _round_up(cfg.vocab_size, 128)
    K0 = _round_up(E, 128)
    wb = 2 if cfg.compute_dtype == "bfloat16" else 4
    weights = (Vp * E + (K0 + H) * 4 * H + max(n - 1, 1) * 2 * H * 4 * H) * wb \
        + n * 4 * H * 4
    streams = n * BB * 6 * H * wb        # hs, cs, gs out blocks
    scratch = 2 * n * BB * H * 4
    return weights + streams + scratch + BB * H * 4


def _bwd_frame_bytes(cfg, BB: int) -> int:
    """Estimated VMEM frame of the backward kernel. Dominated by the f32
    weight-gradient accumulators, which are FIXED-cost (independent of BB):
    at H=512/n=2 they alone are 13.7MB, which is why the backward blows the
    compiler's default 16MB scoped-vmem limit while the forward fits
    (measured: 17.81MB frame at H=512/n=2/BB=256 on v5e)."""
    H, E, n = cfg.hidden_dim, cfg.embedding_dim, cfg.num_layers
    Vp = _round_up(cfg.vocab_size, 128)
    K0 = _round_up(E, 128)
    wb = 2 if cfg.compute_dtype == "bfloat16" else 4
    dW = ((K0 + H) * 4 * H + max(n - 1, 1) * 2 * H * 4 * H + n * 4 * H
          + Vp * E) * 4
    streams = n * BB * 8 * H * wb        # hs, cs, gs, hs_prev, cs_prev blocks
    scratch = 2 * n * BB * H * 4
    return dW + streams + scratch + BB * H * 4


# Margin under the XLA TPU compiler's default 16MB scoped-vmem limit. Kernels
# whose estimated frame fits keep the default (a raised limit can send the
# compiler down a pathologically slow path for mid-size shapes — see
# ops/pallas_decoder.py); larger frames get the explicit 112MB cap the other
# kernel families use.
_DEFAULT_SCOPED_LIMIT = 14 * 1024 * 1024


def _frame_params_kw(frame_bytes: int) -> dict:
    if frame_bytes > _DEFAULT_SCOPED_LIMIT:
        return {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024)}
    return {}


def pallas_encoder_supported(cfg, batch: int) -> bool:
    if cfg.bidirectional or cfg.apply_dropout:
        return False
    if not (1 <= cfg.num_layers <= 8 and cfg.hidden_dim % 128 == 0
            and batch % 8 == 0):
        return False
    BB = _block_rows(cfg.hidden_dim, cfg.num_layers, batch)
    return _vmem_estimate(cfg, BB) <= _VMEM_BUDGET


# ----------------------------------------------------------------- forward


def _fwd_kernel(n, H, Vp, K0,
                toks_ref, emb_ref, w0_ref, wr_ref, bs_ref,
                hlast_ref, hs_ref, cs_ref, gs_ref,
                h_s, c_s):
    t = pl.program_id(1)
    L = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        h_s[:] = jnp.zeros_like(h_s)
        c_s[:] = jnp.zeros_like(c_s)

    BB = h_s.shape[1]
    trow = t % 8
    tok = toks_ref[trow][:, None]
    col = jax.lax.broadcasted_iota(jnp.int32, (BB, Vp), 1)
    oh = (col == tok).astype(emb_ref.dtype)
    emb_x = jnp.dot(oh, emb_ref[:], preferred_element_type=jnp.float32)
    pad = K0 - emb_x.shape[1]
    x = jnp.concatenate([emb_x, jnp.zeros((BB, pad), jnp.float32)], axis=1) \
        if pad else emb_x

    for l in range(n):  # static unroll over layers
        w_l = w0_ref[:] if l == 0 else wr_ref[l - 1]
        inp = jnp.concatenate([x, h_s[l]], axis=1).astype(w_l.dtype)
        gates = jnp.dot(inp, w_l, preferred_element_type=jnp.float32) \
            + bs_ref[l, 0]
        i_, f_, g_, o_ = _acts(gates, H)
        c_n = f_ * c_s[l] + i_ * g_
        h_n = o_ * jnp.tanh(c_n)
        h_s[l] = h_n
        c_s[l] = c_n
        hs_ref[0, l] = h_n.astype(hs_ref.dtype)
        cs_ref[0, l] = c_n.astype(cs_ref.dtype)
        gs_ref[0, l] = jnp.concatenate([i_, f_, g_, o_], axis=1).astype(
            gs_ref.dtype)  # ACTIVATED gates (residual contract)
        x = h_n

    @pl.when(t == L - 1)
    def _():
        hlast_ref[:] = x  # top layer's h at the final step (pooled feature)


# ---------------------------------------------------------------- backward


def _bwd_kernel(n, H, Vp, E, K0,
                dhlast_ref, toks_ref,
                hs_ref, cs_ref, gs_ref, hsp_ref, csp_ref,
                emb_ref, w0_ref, wr_ref,
                dw0_ref, dwr_ref, dbs_ref, demb_ref,
                dh_s, dc_s):
    tg = pl.program_id(1)
    L = pl.num_programs(1)
    t = L - 1 - tg
    ib = pl.program_id(0)

    @pl.when(jnp.logical_and(ib == 0, tg == 0))
    def _():
        dw0_ref[:] = jnp.zeros_like(dw0_ref)
        dwr_ref[:] = jnp.zeros_like(dwr_ref)
        dbs_ref[:] = jnp.zeros_like(dbs_ref)
        demb_ref[:] = jnp.zeros_like(demb_ref)

    @pl.when(tg == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = jnp.zeros_like(dc_s)
        # the single cotangent: d(h_top at t = L-1)
        dh_s[n - 1] = dhlast_ref[:]

    BB = dh_s.shape[1]
    first = (t == 0)
    trow = t % 8
    col = jax.lax.broadcasted_iota(jnp.int32, (BB, Vp), 1)

    from_above = jnp.zeros((BB, H), jnp.float32)
    for l in range(n - 1, -1, -1):
        a_all = gs_ref[0, l].astype(jnp.float32)
        i_, f_, g_, o_ = _split_acts(a_all, H)
        c_prev = jnp.where(first, 0.0, csp_ref[0, l].astype(jnp.float32))
        h_prev = jnp.where(first, 0.0, hsp_ref[0, l].astype(jnp.float32))
        tc = jnp.tanh(cs_ref[0, l].astype(jnp.float32))
        dh_total = dh_s[l] + from_above
        dc_tot = dc_s[l] + dh_total * o_ * (1.0 - tc * tc)
        w_l = w0_ref[:] if l == 0 else wr_ref[l - 1]
        dgates = jnp.concatenate([
            dc_tot * g_ * i_ * (1.0 - i_),
            dc_tot * c_prev * f_ * (1.0 - f_),
            dc_tot * i_ * (1.0 - g_ * g_),
            dh_total * tc * o_ * (1.0 - o_),
        ], axis=1).astype(w_l.dtype)
        dinp = jax.lax.dot_general(dgates, w_l, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dbs_ref[l, 0] += jnp.sum(dgates.astype(jnp.float32), axis=0)
        dc_s[l] = dc_tot * f_

        if l > 0:
            x_in = hs_ref[0, l - 1].astype(jnp.float32)
            inp = jnp.concatenate([x_in, h_prev], axis=1).astype(w_l.dtype)
            dwr_ref[l - 1] += jax.lax.dot_general(
                inp, dgates, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            from_above = dinp[:, :H]
            dh_s[l] = dinp[:, H:]
        else:
            tok = toks_ref[trow][:, None]
            oh = (col == tok).astype(emb_ref.dtype)
            emb_x = jnp.dot(oh, emb_ref[:], preferred_element_type=jnp.float32)
            pad = K0 - E
            x0 = jnp.concatenate([emb_x, jnp.zeros((BB, pad), jnp.float32)],
                                 axis=1) if pad else emb_x
            inp0 = jnp.concatenate([x0, h_prev], axis=1).astype(w_l.dtype)
            dw0_ref[:] += jax.lax.dot_general(
                inp0, dgates, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            demb_ref[:] += jax.lax.dot_general(
                oh, dinp[:, :E].astype(emb_ref.dtype),
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            dh_s[0] = dinp[:, K0:]


# ----------------------------------------------------------------- wrapper


def _prep_weights(params, cfg, Vp, K0, dtype):
    H, E, n = cfg.hidden_dim, cfg.embedding_dim, cfg.num_layers
    emb = jnp.zeros((Vp, E), dtype).at[:cfg.vocab_size].set(
        params["embedding"]["weight"].astype(dtype))
    l0 = params["lstm_layer_0"]
    w0 = jnp.zeros((K0 + H, 4 * H), dtype)
    w0 = w0.at[:E].set(l0["Wx"].T.astype(dtype))
    w0 = w0.at[K0:].set(l0["Wh"].T.astype(dtype))
    if n > 1:
        wr = jnp.stack([
            jnp.concatenate([params[f"lstm_layer_{l}"]["Wx"].T,
                             params[f"lstm_layer_{l}"]["Wh"].T],
                            axis=0).astype(dtype)
            for l in range(1, n)])
    else:
        wr = jnp.zeros((1, 2 * H, 4 * H), dtype)  # dummy, never read
    bs = jnp.stack([params[f"lstm_layer_{l}"]["bias"].astype(jnp.float32)[None]
                    for l in range(n)])
    return emb, w0, wr, bs


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3))
def encoder_stack_pallas(params: dict, cfg, tokens, interpret: bool):
    """Tokens ``[B, L] int`` -> pooled feature ``h_top[:, L-1]`` ``[B, H]``.

    Replaces embedding + ``num_layers`` LSTM sequence passes with one fused
    kernel; gradients cover every LSTM layer and the embedding table.
    """
    h_last, _ = _enc_fwd(params, cfg, tokens, interpret)
    return h_last


def _enc_fwd(params, cfg, tokens, interpret):
    B, L = tokens.shape
    H, E, n = cfg.hidden_dim, cfg.embedding_dim, cfg.num_layers
    Vp = _round_up(cfg.vocab_size, 128)
    K0 = _round_up(E, 128)
    dtype = cfg.dtype

    emb, w0, wr, bs = _prep_weights(params, cfg, Vp, K0, dtype)
    Lp = _round_up(L, 8)
    toks_t = jnp.zeros((Lp, B), jnp.int32).at[:L].set(
        jnp.swapaxes(tokens.astype(jnp.int32), 0, 1))

    BB = _block_rows(H, n, B)
    grid = (pl.cdiv(B, BB), L)
    tb = lambda w_: pl.BlockSpec((1, n, BB, w_), lambda ib, t: (t, 0, ib, 0),
                                 memory_space=pltpu.VMEM)
    tb2 = pl.BlockSpec((8, BB), lambda ib, t: (t // 8, ib),
                       memory_space=pltpu.VMEM)
    row = lambda w_: pl.BlockSpec((BB, w_), lambda ib, t: (ib, 0),
                                  memory_space=pltpu.VMEM)
    const = lambda s: pl.BlockSpec(s, lambda ib, t: (0,) * len(s),
                                   memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, n, H, Vp, K0),
        grid=grid,
        in_specs=[
            tb2,
            const((Vp, E)), const((K0 + H, 4 * H)),
            const((max(n - 1, 1), 2 * H, 4 * H)), const((n, 1, 4 * H)),
        ],
        out_specs=(row(H), tb(H), tb(H), tb(4 * H)),
        out_shape=(
            jax.ShapeDtypeStruct((B, H), jnp.float32),      # pooled h
            jax.ShapeDtypeStruct((L, n, B, H), dtype),      # hs
            jax.ShapeDtypeStruct((L, n, B, H), dtype),      # cs
            jax.ShapeDtypeStruct((L, n, B, 4 * H), dtype),  # gates
        ),
        scratch_shapes=[pltpu.VMEM((n, BB, H), jnp.float32)] * 2,
        interpret=interpret,
        **_frame_params_kw(_fwd_frame_bytes(cfg, BB)),
    )(toks_t, emb, w0, wr, bs)

    h_last, hs, cs, gs = outs
    return h_last, (params, toks_t, hs, cs, gs)


def _enc_fwd_rule(params, cfg, tokens, interpret):
    return _enc_fwd(params, cfg, tokens, interpret)


def _enc_bwd_rule(cfg, interpret, residuals, dh_last):
    params, toks_t, hs, cs, gs = residuals
    L, n, B, H = hs.shape
    E = cfg.embedding_dim
    Vp = _round_up(cfg.vocab_size, 128)
    K0 = _round_up(E, 128)
    dtype = cfg.dtype

    emb, w0, wr, _ = _prep_weights(params, cfg, Vp, K0, dtype)

    BB = _block_rows(H, n, B)
    grid = (pl.cdiv(B, BB), L)

    def rev(ib, tg):
        return (L - 1 - tg, 0, ib, 0)

    def rev2(ib, tg):
        return ((L - 1 - tg) // 8, ib)

    def rev_prev(ib, tg):
        return (jnp.maximum(L - 2 - tg, 0), 0, ib, 0)

    tbr = lambda w_: pl.BlockSpec((1, n, BB, w_), rev, memory_space=pltpu.VMEM)
    tbp = lambda w_: pl.BlockSpec((1, n, BB, w_), rev_prev,
                                  memory_space=pltpu.VMEM)
    tbr2 = pl.BlockSpec((8, BB), rev2, memory_space=pltpu.VMEM)
    row = lambda w_: pl.BlockSpec((BB, w_), lambda ib, tg: (ib, 0),
                                  memory_space=pltpu.VMEM)
    const = lambda s: pl.BlockSpec(s, lambda ib, tg: (0,) * len(s),
                                   memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n, H, Vp, E, K0),
        grid=grid,
        in_specs=[
            row(H), tbr2,
            tbr(H), tbr(H), tbr(4 * H), tbp(H), tbp(H),
            const((Vp, E)), const((K0 + H, 4 * H)),
            const((max(n - 1, 1), 2 * H, 4 * H)),
        ],
        out_specs=(
            const((K0 + H, 4 * H)),
            const((max(n - 1, 1), 2 * H, 4 * H)),
            const((n, 1, 4 * H)),
            const((Vp, E)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((K0 + H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((max(n - 1, 1), 2 * H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((Vp, E), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((n, BB, H), jnp.float32)] * 2,
        interpret=interpret,
        **_frame_params_kw(_bwd_frame_bytes(cfg, BB)),
    )(dh_last.astype(jnp.float32), toks_t, hs, cs, gs, hs, cs, emb, w0, wr)

    dw0, dwr, dbs, demb = outs
    V = cfg.vocab_size
    dparams = {
        "embedding": {"weight": demb[:V]},
        "lstm_layer_0": {"Wx": dw0[:E].T, "Wh": dw0[K0:].T, "bias": dbs[0, 0]},
    }
    for l in range(1, n):
        dparams[f"lstm_layer_{l}"] = {"Wx": dwr[l - 1, :H].T,
                                      "Wh": dwr[l - 1, H:].T,
                                      "bias": dbs[l, 0]}
    # head params flow through autodiff outside the kernel boundary
    for name in ("condition_fc", "fc_mu", "fc_logvar_hidden", "fc_logvar"):
        if name in params:
            dparams[name] = jax.tree_util.tree_map(jnp.zeros_like, params[name])
    import numpy as _np
    dtokens = _np.zeros((B, L), dtype=jax.dtypes.float0)
    return dparams, dtokens


encoder_stack_pallas.defvjp(_enc_fwd_rule, _enc_bwd_rule)
