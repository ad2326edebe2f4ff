"""Custom-VJP teacher-forced decoder for shapes beyond the Pallas kernels.

At hidden sizes the fused training-decoder kernels cannot compile (weights
no longer fit VMEM-resident — measured H>=1024 on v5e, see
``ops/pallas_train_decoder.py``), the scan decoder's autodiff has a forced
tradeoff: storing the f32 gate activations OOMs HBM at the scaled config
(19.75G needed of 15.75G, measured), so ``cfg.remat`` recomputes the whole
forward inside the backward (+~1x forward FLOPs), and the remat checkpoint
still stores the f32 (h, c) carries — 8.6GB at hidden 1024 / batch 2048.

This module is the third point on that curve: a hand-written VJP that
stores the per-step residuals in the **compute dtype** (bf16) — gates
[L, n, B, 4H] + h/c [L, n, B, H] + input tokens — which is *less* memory
than remat's f32 carries AND avoids the recompute. The backward is one
reverse-time scan threading the (dh, dc) chains for all layers with the
weight-gradient accumulators carried in f32 (unrolled so the carry traffic
amortizes), exactly the dataflow of the Pallas backward kernel
(``pallas_train_decoder._bwd_kernel``) expressed in XLA.

Gradient semantics match the scan decoder: the argmax feedback token
carries no gradient. Numerics of the forward match ``decoder_apply``'s
scan cell-for-cell (same matmul dtypes and f32 accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mlx_vae_tpu.models.layers import linear
from mlx_vae_tpu.ops.pallas_train_decoder import _split_acts


def _acts(gates, H):
    i = jax.nn.sigmoid(gates[..., :H])
    f = jax.nn.sigmoid(gates[..., H:2 * H])
    g = jnp.tanh(gates[..., 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H:])
    return i, f, g, o


def _weights(params, cfg, dtype):
    """Per-layer combined [in + H, 4H] weights (layer 0: in = E + C)."""
    ws = []
    for l in range(cfg.num_layers):
        p = params[f"lstm_layer_{l}"]
        ws.append(jnp.concatenate([p["Wx"].T, p["Wh"].T], axis=0).astype(dtype))
    return ws


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def decoder_train_cv(params: dict, cfg, h_init, conditions, target_seq,
                     tf_mask):
    """Teacher-forced decode -> logits ``[B, L, vocab]``.

    ``h_init [B, H]`` is the shared per-layer initial hidden state (cell
    states start at zero); ``tf_mask [L] bool`` are the per-step coin flips.
    """
    logits, _ = _cv_fwd(params, cfg, h_init, conditions, target_seq, tf_mask)
    return logits


def _cv_fwd(params, cfg, h_init, conditions, target_seq, tf_mask,
            store_h: bool = False):
    B, L = target_seq.shape
    n, H = cfg.num_layers, cfg.hidden_dim
    dtype = cfg.dtype
    cond_f = conditions.astype(jnp.float32)

    ws = _weights(params, cfg, dtype)
    bs = [params[f"lstm_layer_{l}"]["bias"].astype(jnp.float32)
          for l in range(n)]
    emb_w = params["embedding"]["weight"].astype(dtype)
    V = emb_w.shape[0]

    targets_t = jnp.swapaxes(target_seq.astype(jnp.int32), 0, 1)  # [L, B]
    h0 = jnp.broadcast_to(h_init[None], (n,) + h_init.shape).astype(jnp.float32)
    c0 = jnp.zeros_like(h0)
    token0 = jnp.full((B,), cfg.start_token, jnp.int32)

    def step(carry, xs):
        h, c, token = carry
        tf_t, target_t = xs
        oh = jax.nn.one_hot(token, V, dtype=dtype)
        # .astype(dtype) after the f32-accumulated dot: bit-matches the scan
        # path's embedding() in bf16 mode
        emb = jnp.dot(oh, emb_w,
                      preferred_element_type=jnp.float32).astype(dtype)
        x = jnp.concatenate([emb.astype(jnp.float32), cond_f], axis=1)
        new_h, new_c, gates_all = [], [], []
        for l in range(n):
            inp = jnp.concatenate([x.astype(dtype), h[l].astype(dtype)], axis=1)
            gates = jnp.dot(inp, ws[l], preferred_element_type=jnp.float32) \
                + bs[l]
            i_, f_, g_, o_ = _acts(gates, H)
            c_n = f_ * c[l] + i_ * g_
            h_n = o_ * jnp.tanh(c_n)
            new_h.append(h_n)
            new_c.append(c_n)
            # residual contract: ACTIVATED gates [i, f, g, o]
            gates_all.append(
                jnp.concatenate([i_, f_, g_, o_], axis=1).astype(dtype))
            x = h_n
        h = jnp.stack(new_h)
        c = jnp.stack(new_c)
        logits = linear(params["fc_out"], x, dtype)
        pred = jnp.argmax(logits, axis=1).astype(jnp.int32)
        next_token = jnp.where(tf_t, target_t, pred)
        # residuals: gates + c only, as per-layer tuples (stacking [n, B, .]
        # arrays made XLA pick transposed layouts whose copies OOM'd the
        # scaled config, and lane-concatenating them cost a 16MB copy per
        # step); h is NOT stored, it is recomputed in the backward as
        # o * tanh(c) from these. The Pallas backward (store_h=True) streams
        # h directly, so it stores the per-layer h too.
        store = (tuple(gates_all),
                 tuple(ci.astype(dtype) for ci in new_c),
                 tuple(hi.astype(dtype) for hi in new_h) if store_h else (),
                 token)
        return (h, c, next_token), (logits, store)

    _, (logits_t, stores) = jax.lax.scan(step, (h0, c0, token0),
                                         (tf_mask, targets_t))
    residuals = (params, h_init, conditions, target_seq, stores)
    return jnp.swapaxes(logits_t, 0, 1), residuals


def _cv_fwd_rule(params, cfg, h_init, conditions, target_seq, tf_mask):
    return _cv_fwd(params, cfg, h_init, conditions, target_seq, tf_mask)


def _cv_bwd_rule(cfg, residuals, dlogits):
    params, h_init, conditions, target_seq, stores = residuals
    gates_t, cs_t, _, toks_t = stores  # tuples of [L, B, 4H] / [L, B, H]; [L, B]
    L, B = toks_t.shape
    n, H = cfg.num_layers, cfg.hidden_dim
    dtype = cfg.dtype
    cond_f = conditions.astype(jnp.float32)

    ws = _weights(params, cfg, dtype)
    emb_w = params["embedding"]["weight"].astype(dtype)
    V = emb_w.shape[0]
    E = emb_w.shape[1]
    C = cond_f.shape[1]
    wout = params["fc_out"]["weight"].astype(dtype)  # [V, H]

    dlog_t = jnp.swapaxes(dlogits.astype(jnp.float32), 0, 1)  # [L, B, V]
    h_init_f = h_init.astype(jnp.float32)

    def zeros_w():
        return ([jnp.zeros_like(w, jnp.float32) for w in ws],
                [jnp.zeros((4 * H,), jnp.float32) for _ in range(n)],
                jnp.zeros((V, H), jnp.float32),   # dwout
                jnp.zeros((V,), jnp.float32),     # dbout
                jnp.zeros((V, E), jnp.float32),   # demb
                jnp.zeros((B, C), jnp.float32))   # dcond

    def h_of(acts_row, cs_row):
        """Recompute h_t = o * tanh(c_t) from one layer's stored residuals
        (the gates residuals are ACTIVATED, so o is a slice)."""
        o = acts_row[:, 3 * H:].astype(jnp.float32)
        return o * jnp.tanh(cs_row.astype(jnp.float32))

    def bstep(carry, xs):
        dh, dc, acc = carry
        dws, dbs, dwout, dbout, demb, dcond = acc
        dlog, tok, t, gates_rows, cs_rows = xs
        is_first = (t == 0)
        # current rows stream through xs; only the PREVIOUS-step rows are
        # fetched dynamically (materializing shifted copies of the gates
        # arrays doubled the dominant residual buffers and OOM'd the scaled
        # config).
        tp = jnp.maximum(t - 1, 0)
        gp_rows = tuple(jax.lax.dynamic_index_in_dim(g, tp, 0, False)
                        for g in gates_t)
        cp_rows = tuple(jax.lax.dynamic_index_in_dim(cn, tp, 0, False)
                        for cn in cs_t)
        h_top = h_of(gates_rows[n - 1], cs_rows[n - 1])
        dlog_c = dlog.astype(dtype)
        dwout = dwout + jnp.dot(dlog_c.T, h_top.astype(dtype),
                                preferred_element_type=jnp.float32)
        dbout = dbout + jnp.sum(dlog, axis=0)
        from_above = jnp.dot(dlog_c, wout, preferred_element_type=jnp.float32)

        new_dh, new_dc = [None] * n, [None] * n
        for l in range(n - 1, -1, -1):
            a_all = gates_rows[l].astype(jnp.float32)
            i_, f_, g_, o_ = _split_acts(a_all, H)
            c_prev = jnp.where(is_first, 0.0,
                               cp_rows[l].astype(jnp.float32))
            h_prev = jnp.where(is_first, h_init_f,
                               h_of(gp_rows[l], cp_rows[l])).astype(dtype)
            tc = jnp.tanh(cs_rows[l].astype(jnp.float32))
            dh_total = dh[l] + from_above
            dc_tot = dc[l] + dh_total * o_ * (1.0 - tc * tc)
            dgates = jnp.concatenate([
                dc_tot * g_ * i_ * (1.0 - i_),
                dc_tot * c_prev * f_ * (1.0 - f_),
                dc_tot * i_ * (1.0 - g_ * g_),
                dh_total * tc * o_ * (1.0 - o_),
            ], axis=1).astype(dtype)
            dinp = jnp.dot(dgates, ws[l].T, preferred_element_type=jnp.float32)
            dbs[l] = dbs[l] + jnp.sum(dgates.astype(jnp.float32), axis=0)
            new_dc[l] = dc_tot * f_
            if l > 0:
                x_in = h_of(gates_rows[l - 1], cs_rows[l - 1]).astype(dtype)
                inp = jnp.concatenate([x_in, h_prev], axis=1)
                dws[l] = dws[l] + jnp.dot(
                    inp.T, dgates, preferred_element_type=jnp.float32)
                from_above = dinp[:, :H]
                new_dh[l] = dinp[:, H:]
            else:
                oh = jax.nn.one_hot(tok, V, dtype=dtype)
                emb = jnp.dot(oh, emb_w,
                              preferred_element_type=jnp.float32).astype(dtype)
                x0 = jnp.concatenate([emb.astype(jnp.float32), cond_f],
                                     axis=1).astype(dtype)
                inp0 = jnp.concatenate([x0, h_prev], axis=1)
                dws[0] = dws[0] + jnp.dot(
                    inp0.T, dgates, preferred_element_type=jnp.float32)
                demb = demb + jnp.dot(
                    oh.T, dinp[:, :E].astype(dtype),
                    preferred_element_type=jnp.float32)
                dcond = dcond + dinp[:, E:E + C]
                new_dh[0] = dinp[:, E + C:]
        return ((jnp.stack(new_dh), jnp.stack(new_dc),
                 (dws, dbs, dwout, dbout, demb, dcond)), None)

    init = (jnp.zeros((n, B, H), jnp.float32),
            jnp.zeros((n, B, H), jnp.float32), zeros_w())
    (dh, _, acc), _ = jax.lax.scan(
        bstep, init, (dlog_t, toks_t, jnp.arange(L), gates_t, cs_t),
        reverse=True, unroll=4)
    dws, dbs, dwout, dbout, demb, dcond = acc

    dparams = {
        "embedding": {"weight": demb},
        "fc_out": {"weight": dwout, "bias": dbout},
        "z_to_hidden": jax.tree_util.tree_map(
            jnp.zeros_like, params["z_to_hidden"]),
        "condition_to_hidden": jax.tree_util.tree_map(
            jnp.zeros_like, params["condition_to_hidden"]),
    }
    for l in range(n):
        in_w = dws[l].shape[0] - H
        dparams[f"lstm_layer_{l}"] = {"Wx": dws[l][:in_w].T,
                                      "Wh": dws[l][in_w:].T,
                                      "bias": dbs[l]}
    dh_init = jnp.sum(dh, axis=0)  # every layer's h_prev at t=0 is h_init
    import numpy as _np
    dtargets = _np.zeros(target_seq.shape, dtype=jax.dtypes.float0)
    dtf = _np.zeros((L,), dtype=jax.dtypes.float0)
    return dparams, dh_init, dcond, dtargets, dtf


decoder_train_cv.defvjp(_cv_fwd_rule, _cv_bwd_rule)


# ---------------------------------------------------------------------------
# Pallas-backward variant: the decoder's argmax/TF token feedback carries no
# gradient, so — although the *forward* cannot be decomposed by layer (step
# t's bottom input depends on step t-1's top output) — the *backward*
# factorizes into independent per-layer reverse-time passes, top-down. Each
# pass is exactly the fused per-layer LSTM backward kernel
# (``ops/pallas_seq_lstm.lstm_seq_bwd_pallas_tm``: weights + dW accumulators
# VMEM-resident, gate-axis-blocked buffers at large H), and the fc_out /
# embedding gradients become single large flat matmuls over ``[L*B, .]``.
# This is what lets the scaled config (hidden 1024 / 4 layers — reference
# BASELINE scaled shape) run a fused backward even though no fused
# whole-decoder kernel can hold its weights in VMEM.
# ---------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def decoder_cvp_supported(cfg, batch: int) -> bool:
    """Whether every per-layer backward kernel compiles for this shape."""
    from mlx_vae_tpu.ops.pallas_seq_lstm import pallas_seq_supported
    H = cfg.hidden_dim
    I0 = _round_up(cfg.embedding_dim + cfg.num_conditions, 128)
    wb = 2 if cfg.compute_dtype == "bfloat16" else 4
    if not pallas_seq_supported(I0, H, batch, wb):
        return False
    if cfg.num_layers > 1 and not pallas_seq_supported(H, H, batch, wb):
        return False
    return True


def _use_kernel_fwd(cfg, batch: int, interpret: bool) -> bool:
    from mlx_vae_tpu.ops.pallas_train_decoder import fwd_blk_supported
    if not cfg.use_pallas:
        return False
    if not (interpret or jax.default_backend() == "tpu"):
        return False
    return fwd_blk_supported(cfg, batch)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 6))
def decoder_train_cvp(params: dict, cfg, h_init, conditions, target_seq,
                      tf_mask, interpret: bool = False):
    """``decoder_train_cv`` with the per-layer Pallas backward (and, when
    the shape allows, the gate-blocked fused forward kernel)."""
    logits, _ = _cvp_fwd_rule(params, cfg, h_init, conditions, target_seq,
                              tf_mask, interpret)
    return logits


def _cvp_fwd_rule(params, cfg, h_init, conditions, target_seq, tf_mask,
                  interpret):
    if _use_kernel_fwd(cfg, target_seq.shape[0], interpret):
        from mlx_vae_tpu.ops.pallas_train_decoder import decoder_fwd_blk
        logits, stores = decoder_fwd_blk(
            params, cfg, h_init.astype(jnp.float32),
            conditions.astype(jnp.float32), target_seq, tf_mask, interpret)
        return logits, (params, h_init, conditions, target_seq, stores)
    return _cv_fwd(params, cfg, h_init, conditions, target_seq, tf_mask,
                   store_h=True)


def _cvp_bwd_rule(cfg, interpret, residuals, dlogits):
    from mlx_vae_tpu.ops.pallas_seq_lstm import lstm_seq_bwd_pallas_tm

    params, h_init, conditions, target_seq, stores = residuals
    n, H = cfg.num_layers, cfg.hidden_dim
    dtype = cfg.dtype
    cond_f = conditions.astype(jnp.float32)

    stacked = len(stores) == 4 and not isinstance(stores[0], tuple) \
        and stores[0].ndim == 2  # kernel-fwd: (toks [L,B], hs, cs, gs)
    if stacked:
        toks_t, hs_stk, cs_stk, gs_stk = stores
        L, B = toks_t.shape
        # [L, n, B, .] -> [L*n, B, .] views; per-layer rows are addressed
        # inside the kernels via (stride=n, offset=l) index maps — no copies.
        hs2 = hs_stk.reshape(L * n, B, H)
        cs2 = cs_stk.reshape(L * n, B, H)
        gs2 = gs_stk.reshape(L * n, B, 4 * H)
        res = lambda l: dict(hs_t=hs2, cs_t=cs2, gates_t=gs2,
                             res_stride=n, res_offset=l)
        h_top = hs_stk[:, n - 1]  # [L, B, H] (one slice copy, top layer only)
    else:
        gates_t, cs_t, hs_t, toks_t = stores
        L, B = toks_t.shape
        res = lambda l: dict(hs_t=hs_t[l], cs_t=cs_t[l], gates_t=gates_t[l],
                             res_stride=1, res_offset=0)
        h_top = hs_t[n - 1]

    ws = _weights(params, cfg, dtype)
    emb_w = params["embedding"]["weight"].astype(dtype)
    V, E = emb_w.shape
    C = cond_f.shape[1]
    wout = params["fc_out"]["weight"].astype(dtype)  # [V, H]

    # fc_out gradients + the top layer's output cotangent as flat matmuls.
    dlog_flat = jnp.swapaxes(dlogits, 0, 1).reshape(L * B, V)
    dlog_c = dlog_flat.astype(dtype)
    h_top_flat = h_top.reshape(L * B, H).astype(dtype)
    dwout = jnp.dot(dlog_c.T, h_top_flat, preferred_element_type=jnp.float32)
    dbout = jnp.sum(dlog_flat.astype(jnp.float32), axis=0)
    from_above = jnp.dot(dlog_c, wout, preferred_element_type=jnp.float32)
    dh_stream = from_above.reshape(L, B, H)

    h_init_f = h_init.astype(jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)
    zrow = jnp.zeros((B, H), jnp.float32)
    dh_init = jnp.zeros((B, H), jnp.float32)
    dparams = {
        "embedding": {},
        "fc_out": {"weight": dwout, "bias": dbout},
        "z_to_hidden": jax.tree_util.tree_map(
            jnp.zeros_like, params["z_to_hidden"]),
        "condition_to_hidden": jax.tree_util.tree_map(
            jnp.zeros_like, params["condition_to_hidden"]),
    }

    for l in range(n - 1, 0, -1):
        if stacked:  # layer l's input = layer l-1's h, inside the stack
            xs_kw = dict(xs_t=hs2, xs_stride=n, xs_offset=l - 1)
        else:
            xs_kw = dict(xs_t=hs_t[l - 1].astype(dtype))
        dxs, dwcat, db, dh0, _ = lstm_seq_bwd_pallas_tm(
            ws[l], h0=h_init_f, c0=c0, dhs_t=dh_stream, dhf=zrow, dcf=zrow,
            interpret=interpret, **res(l), **xs_kw)
        dparams[f"lstm_layer_{l}"] = {"Wx": dwcat[:H].T, "Wh": dwcat[H:].T,
                                      "bias": db}
        dh_init = dh_init + dh0
        dh_stream = dxs

    # Layer 0: input stream = [embedding, conditions], zero-padded to a
    # lane-aligned width (zero weight rows -> exact gradients, zero extra).
    toks_flat = toks_t.reshape(L * B)
    oh_flat = jax.nn.one_hot(toks_flat, V, dtype=dtype)
    emb_flat = jnp.dot(oh_flat, emb_w,
                       preferred_element_type=jnp.float32).astype(dtype)
    I0 = E + C
    I0p = _round_up(I0, 128)
    xs0 = jnp.concatenate(
        [emb_flat.reshape(L, B, E).astype(jnp.float32),
         jnp.broadcast_to(cond_f[None], (L, B, C)),
         jnp.zeros((L, B, I0p - I0), jnp.float32)], axis=2).astype(dtype)
    w0 = ws[0]  # [E+C+H, 4H]
    w0p = jnp.concatenate(
        [w0[:I0], jnp.zeros((I0p - I0, 4 * H), w0.dtype), w0[I0:]], axis=0)
    dxs0, dwcat0, db0, dh0, _ = lstm_seq_bwd_pallas_tm(
        w0p, xs_t=xs0, h0=h_init_f, c0=c0, dhs_t=dh_stream, dhf=zrow,
        dcf=zrow, interpret=interpret, **res(0))
    dparams["lstm_layer_0"] = {"Wx": dwcat0[:I0].T, "Wh": dwcat0[I0p:].T,
                               "bias": db0}
    dh_init = dh_init + dh0

    dxs0_flat = dxs0.reshape(L * B, I0p)
    demb = jnp.dot(oh_flat.T, dxs0_flat[:, :E].astype(dtype),
                   preferred_element_type=jnp.float32)
    dcond = jnp.sum(dxs0[:, :, E:E + C], axis=0)
    dparams["embedding"]["weight"] = demb

    import numpy as _np
    dtargets = _np.zeros(target_seq.shape, dtype=jax.dtypes.float0)
    dtf = _np.zeros((L,), dtype=jax.dtypes.float0)
    return dparams, dh_init, dcond, dtargets, dtf


decoder_train_cvp.defvjp(_cvp_fwd_rule, _cvp_bwd_rule)
