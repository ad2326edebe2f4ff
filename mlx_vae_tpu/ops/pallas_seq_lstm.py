"""Fused full-sequence Pallas LSTM layer (forward + hand-written backward).

One `pallas_call` runs the whole recurrence for a layer: the grid is
``(batch_blocks, L)`` — TPU grids iterate the last dimension fastest and
sequentially, so the (h, c) VMEM scratch persists across timesteps of a
block. Weights live in VMEM for the entire kernel; per step the only HBM
traffic is streaming ``x_t`` in and ``(h_t, c_t, gates_t)`` out.

The backward kernel runs time-reversed with a (dh, dc) scratch chain and
accumulates ``dWx / dWh / db`` into constant-index output blocks that stay
VMEM-resident for the whole kernel — no per-step weight-gradient matmul ever
touches HBM (the autodiff scan emits L tiny accumulating matmuls instead,
which dominates the train step; see docs/DESIGN.md).

Supported when H and the input width are lane-aligned (%128); callers fall
back to ``ops.lstm.lstm_sequence`` otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BB = 256  # rows per batch block at H<=256; halved above (VMEM live set ~ H)


def _block_rows(H: int, B: int) -> int:
    return min(_BB if H <= 256 else 128, B)


# Empirical v5e budget for THIS kernel: H=512 (est 16MB) measured good;
# H=1024 (est 58MB, single 16.8MB weight block + two 16.8MB dW blocks)
# fails Mosaic compilation even though the decoder kernel compiles at the
# same total estimate — per-buffer sizes matter, not just the sum. 32MB
# keeps a margin above every proven shape.
_VMEM_BUDGET = 32 * 1024 * 1024

# Gate-axis-blocked variant (H >= 768): the Mosaic failure above is a
# per-buffer limit, so the weight / dW buffers are split into G blocks along
# the 4H axis, each at most _MAX_BUF bytes (the decoder kernel's proven
# largest buffer is 8.4MB; 5MB keeps a margin). Totals may then go up to the
# decoder-kernel-proven 64MB.
_MAX_BUF = 5 * 1024 * 1024
_VMEM_BUDGET_BLK = 64 * 1024 * 1024

# The blocked backward's fully-unrolled per-gate matmuls keep ~41MB of stack
# temporaries live at H=1024/BB=128, over Mosaic's default 16MB scoped-vmem
# limit — raise the per-kernel limit instead of shrinking the batch block
# (smaller BB shrinks the dW matmuls' contraction dim, which costs MXU
# utilization where this kernel spends its FLOPs).
_BLK_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=112 * 1024 * 1024)


_FORCE_G = None  # test hook: force a gate-block count at any shape


def _gate_blocks(input_size: int, hidden: int, wbytes: int = 2) -> int:
    """Blocks to split the 4H gate axis into (1 = unblocked kernels).

    ``wbytes`` is the compute-dtype weight size (2 bf16 / 4 f32) — the
    per-buffer limit is on real bytes, so an f32 weight block is twice the
    bf16 one at the same shape.
    """
    if _FORCE_G:
        return _FORCE_G
    I, H = input_size, hidden
    if _vmem_estimate(I, H, _block_rows(H, 10 ** 9), wbytes) <= _VMEM_BUDGET:
        return 1
    for G in (2, 4, 8):
        cols = 4 * H // G
        if (4 * H) % G or cols % 128:
            continue
        biggest = max((I + H) * cols * wbytes, max(I, H) * cols * 4)
        if biggest <= _MAX_BUF:
            return G
    return 0


def _dtype_wbytes(dtype) -> int:
    return 2 if jnp.dtype(dtype) == jnp.bfloat16 else 4


def _vmem_estimate(input_size: int, hidden: int, BB: int,
                   wbytes: int = 2) -> int:
    """Rough bytes of the backward kernel's VMEM-resident set."""
    I, H = input_size, hidden
    weights = (I + H) * 4 * H * wbytes
    dW = (I + H) * 4 * H * 4 + 4 * H * 4
    # streamed per-t blocks (gates/cs/csp/hsp/xs/dhs/dxs), double-buffered
    streams = 2 * (BB * 4 * H * wbytes + 3 * BB * H * wbytes
                   + BB * I * wbytes + BB * H * 4 + BB * I * 4)
    scratch = 2 * BB * H * 4
    return weights + dW + streams + scratch


def pallas_seq_supported(input_size: int, hidden: int, batch: int,
                         wbytes: int = 2) -> bool:
    if not (input_size % 128 == 0 and hidden % 128 == 0 and batch % 8 == 0):
        return False
    BB = _block_rows(hidden, batch)
    G = _gate_blocks(input_size, hidden, wbytes)
    if G == 0:
        return False
    budget = _VMEM_BUDGET if G == 1 else _VMEM_BUDGET_BLK
    return _vmem_estimate(input_size, hidden, BB, wbytes) <= budget


# ----------------------------------------------------------------- forward


def _fwd_kernel(H, xs_ref, h0_ref, c0_ref, w_ref, b_ref,
                hs_ref, cs_ref, gates_ref, hf_ref, cf_ref,
                h_scr, c_scr):
    t = pl.program_id(1)
    L = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    x = xs_ref[0]
    inp = jnp.concatenate([x, h_scr[:].astype(x.dtype)], axis=1)
    gates = jnp.dot(inp, w_ref[:], preferred_element_type=jnp.float32) + b_ref[0]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    c_new = f * c_scr[:] + i * g
    h_new = o * jnp.tanh(c_new)
    h_scr[:] = h_new
    c_scr[:] = c_new
    hs_ref[0] = h_new.astype(hs_ref.dtype)
    cs_ref[0] = c_new.astype(cs_ref.dtype)
    # residual contract: ACTIVATED gates [i, f, g, o] — the backward slices
    # them instead of re-running 3 sigmoids + a tanh over [BB, 4H]
    gates_ref[0] = jnp.concatenate([i, f, g, o], axis=1).astype(
        gates_ref.dtype)

    @pl.when(t == L - 1)
    def _():
        hf_ref[:] = h_new
        cf_ref[:] = c_new


def _fwd_kernel_blk(H, G, *refs):
    """Gate-axis-blocked forward: per-block weight buffers, same math."""
    xs_ref, h0_ref, c0_ref = refs[:3]
    w_refs = refs[3:3 + G]
    b_ref = refs[3 + G]
    hs_ref, cs_ref, gates_ref, hf_ref, cf_ref = refs[4 + G:9 + G]
    h_scr, c_scr = refs[9 + G:]
    t = pl.program_id(1)
    L = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    x = xs_ref[0]
    inp = jnp.concatenate([x, h_scr[:].astype(x.dtype)], axis=1)
    parts = [jnp.dot(inp, wr[:], preferred_element_type=jnp.float32)
             for wr in w_refs]
    gates = jnp.concatenate(parts, axis=1) + b_ref[0]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    c_new = f * c_scr[:] + i * g
    h_new = o * jnp.tanh(c_new)
    h_scr[:] = h_new
    c_scr[:] = c_new
    hs_ref[0] = h_new.astype(hs_ref.dtype)
    cs_ref[0] = c_new.astype(cs_ref.dtype)
    # residual contract: ACTIVATED gates [i, f, g, o] — the backward slices
    # them instead of re-running 3 sigmoids + a tanh over [BB, 4H]
    gates_ref[0] = jnp.concatenate([i, f, g, o], axis=1).astype(
        gates_ref.dtype)

    @pl.when(t == L - 1)
    def _():
        hf_ref[:] = h_new
        cf_ref[:] = c_new


# ---------------------------------------------------------------- backward


def _bwd_kernel(H, I, gates_ref, cs_ref, csp_ref, hsp_ref, xs_ref,
                h0_ref, c0_ref, w_ref, dhs_ref, dhf_ref, dcf_ref,
                dxs_ref, dwx_ref, dwh_ref, db_ref, dh0_ref, dc0_ref,
                dh_scr, dc_scr):
    tg = pl.program_id(1)
    L = pl.num_programs(1)
    t = L - 1 - tg
    ib = pl.program_id(0)

    @pl.when(jnp.logical_and(ib == 0, tg == 0))
    def _():
        dwx_ref[:] = jnp.zeros_like(dwx_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    @pl.when(tg == 0)
    def _():
        dh_scr[:] = dhf_ref[:]
        dc_scr[:] = dcf_ref[:]

    a_all = gates_ref[0].astype(jnp.float32)  # ACTIVATED [i, f, g, o]
    i = a_all[:, :H]
    f = a_all[:, H:2 * H]
    g = a_all[:, 2 * H:3 * H]
    o = a_all[:, 3 * H:]
    first = (t == 0)
    c_prev = jnp.where(first, c0_ref[:], csp_ref[0].astype(jnp.float32))
    h_prev = jnp.where(first, h0_ref[:], hsp_ref[0].astype(jnp.float32))
    tc = jnp.tanh(cs_ref[0].astype(jnp.float32))

    dh_total = dh_scr[:] + dhs_ref[0]
    dc_tot = dc_scr[:] + dh_total * o * (1.0 - tc * tc)
    dgates = jnp.concatenate([
        dc_tot * g * i * (1.0 - i),
        dc_tot * c_prev * f * (1.0 - f),
        dc_tot * i * (1.0 - g * g),
        dh_total * tc * o * (1.0 - o),
    ], axis=1)
    dgates_c = dgates.astype(w_ref.dtype)

    # d(input) = dgates @ W^T, split into the x part (out) and the h chain.
    dinp = jax.lax.dot_general(
        dgates_c, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dxs_ref[0] = dinp[:, :I]
    dh_scr[:] = dinp[:, I:]
    dc_scr[:] = dc_tot * f

    x = xs_ref[0]
    # dWx += x^T @ dgates ; dWh += h_prev^T @ dgates (contract batch dim)
    dwx_ref[:] += jax.lax.dot_general(
        x, dgates_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwh_ref[:] += jax.lax.dot_general(
        h_prev.astype(w_ref.dtype), dgates_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[0] += jnp.sum(dgates, axis=0)

    @pl.when(tg == L - 1)
    def _():
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]


def _bwd_kernel_blk(H, I, G, *refs):
    """Gate-axis-blocked backward: per-block weight / dW buffers."""
    gates_ref, cs_ref, csp_ref, hsp_ref, xs_ref, h0_ref, c0_ref = refs[:7]
    w_refs = refs[7:7 + G]
    dhs_ref, dhf_ref, dcf_ref = refs[7 + G:10 + G]
    dxs_ref = refs[10 + G]
    dwx_refs = refs[11 + G:11 + 2 * G]
    dwh_refs = refs[11 + 2 * G:11 + 3 * G]
    db_ref, dh0_ref, dc0_ref = refs[11 + 3 * G:14 + 3 * G]
    dh_scr, dc_scr = refs[14 + 3 * G:]
    tg = pl.program_id(1)
    L = pl.num_programs(1)
    t = L - 1 - tg
    ib = pl.program_id(0)
    HG = 4 * H // G

    @pl.when(jnp.logical_and(ib == 0, tg == 0))
    def _():
        for g_ in range(G):
            dwx_refs[g_][:] = jnp.zeros_like(dwx_refs[g_])
            dwh_refs[g_][:] = jnp.zeros_like(dwh_refs[g_])
        db_ref[:] = jnp.zeros_like(db_ref)

    @pl.when(tg == 0)
    def _():
        dh_scr[:] = dhf_ref[:]
        dc_scr[:] = dcf_ref[:]

    a_all = gates_ref[0].astype(jnp.float32)  # ACTIVATED [i, f, g, o]
    i = a_all[:, :H]
    f = a_all[:, H:2 * H]
    g = a_all[:, 2 * H:3 * H]
    o = a_all[:, 3 * H:]
    first = (t == 0)
    c_prev = jnp.where(first, c0_ref[:], csp_ref[0].astype(jnp.float32))
    h_prev = jnp.where(first, h0_ref[:], hsp_ref[0].astype(jnp.float32))
    tc = jnp.tanh(cs_ref[0].astype(jnp.float32))

    dh_total = dh_scr[:] + dhs_ref[0]
    dc_tot = dc_scr[:] + dh_total * o * (1.0 - tc * tc)
    dgates = jnp.concatenate([
        dc_tot * g * i * (1.0 - i),
        dc_tot * c_prev * f * (1.0 - f),
        dc_tot * i * (1.0 - g * g),
        dh_total * tc * o * (1.0 - o),
    ], axis=1)
    dgates_c = dgates.astype(w_refs[0].dtype)
    x = xs_ref[0]
    h_prev_c = h_prev.astype(w_refs[0].dtype)

    dinp = None
    for g_ in range(G):
        dg_g = dgates_c[:, g_ * HG:(g_ + 1) * HG]
        part = jax.lax.dot_general(
            dg_g, w_refs[g_][:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dinp = part if dinp is None else dinp + part
        dwx_refs[g_][:] += jax.lax.dot_general(
            x, dg_g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dwh_refs[g_][:] += jax.lax.dot_general(
            h_prev_c, dg_g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    db_ref[0] += jnp.sum(dgates, axis=0)

    dxs_ref[0] = dinp[:, :I]
    dh_scr[:] = dinp[:, I:]
    dc_scr[:] = dc_tot * f

    @pl.when(tg == L - 1)
    def _():
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]


# ----------------------------------------------------------------- wrapper


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def lstm_sequence_pallas(params: dict, xs, h0, c0, dtype=jnp.float32,
                         interpret: bool = False):
    """Drop-in ``lstm_sequence`` on supported shapes: fused Pallas fwd/bwd.

    ``xs [B, L, I]`` -> ``(hs [B, L, H], (h_final, c_final))``.
    """
    (out, _) = _fwd(params, xs, h0, c0, dtype, interpret)
    return out


def _fwd(params, xs, h0, c0, dtype, interpret):
    B, L, I = xs.shape
    H = h0.shape[-1]
    w = jnp.concatenate([params["Wx"].T, params["Wh"].T], axis=0).astype(dtype)
    bias = params["bias"].astype(jnp.float32)[None]
    xs_t = jnp.swapaxes(xs, 0, 1).astype(dtype)  # [L, B, I]

    BB = _block_rows(H, B)
    grid = (pl.cdiv(B, BB), L)
    tb = lambda wdt: pl.BlockSpec((1, BB, wdt), lambda ib, t: (t, ib, 0),
                                  memory_space=pltpu.VMEM)
    row = lambda wdt: pl.BlockSpec((BB, wdt), lambda ib, t: (ib, 0),
                                   memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda ib, t: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)

    G = _gate_blocks(I, H, _dtype_wbytes(dtype))
    if G == 0:
        raise ValueError(
            f"shape unsupported (input={I}, hidden={H}): no gate-block count "
            "fits the VMEM per-buffer limit; check pallas_seq_supported "
            "before calling")
    store_dtype = dtype
    out_specs = (tb(H), tb(H), tb(4 * H), row(H), row(H))
    out_shape = (
        jax.ShapeDtypeStruct((L, B, H), store_dtype),   # hs (residual+out)
        jax.ShapeDtypeStruct((L, B, H), store_dtype),   # cs (residual)
        jax.ShapeDtypeStruct((L, B, 4 * H), store_dtype),
        jax.ShapeDtypeStruct((B, H), jnp.float32),
        jax.ShapeDtypeStruct((B, H), jnp.float32),
    )
    scratch = [pltpu.VMEM((BB, H), jnp.float32),
               pltpu.VMEM((BB, H), jnp.float32)]
    if G == 1:
        hs_t, cs_t, gates_t, hf, cf = pl.pallas_call(
            functools.partial(_fwd_kernel, H),
            grid=grid,
            in_specs=[tb(I), row(H), row(H), const((I + H, 4 * H)),
                      const((1, 4 * H))],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(xs_t, h0, c0, w, bias)
    else:
        HG = 4 * H // G
        w_blocks = [w[:, g * HG:(g + 1) * HG] for g in range(G)]
        hs_t, cs_t, gates_t, hf, cf = pl.pallas_call(
            functools.partial(_fwd_kernel_blk, H, G),
            grid=grid,
            in_specs=[tb(I), row(H), row(H)]
            + [const((I + H, HG)) for _ in range(G)]
            + [const((1, 4 * H))],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=_BLK_COMPILER_PARAMS,
            interpret=interpret,
        )(xs_t, h0, c0, *w_blocks, bias)

    hs = jnp.swapaxes(hs_t, 0, 1)
    residuals = (params, xs, h0, c0, hs_t, cs_t, gates_t)
    return ((hs, (hf, cf)), residuals)


def _fwd_rule(params, xs, h0, c0, dtype, interpret):
    return _fwd(params, xs, h0, c0, dtype, interpret)


def lstm_seq_bwd_pallas_tm(w, xs_t, h0, c0, hs_t, cs_t, gates_t,
                           dhs_t, dhf, dcf, interpret: bool = False,
                           res_stride: int = 1, res_offset: int = 0,
                           xs_stride: int = 1, xs_offset: int = 0):
    """Time-major fused LSTM-layer backward (reusable building block).

    ``w [I+H, 4H]`` compute-dtype combined weight; ``xs_t [L, B, I]``
    compute-dtype inputs; ``hs_t/cs_t/gates_t`` the forward's time-major
    residuals — ``gates_t`` holds ACTIVATED gates ``[i, f, g, o]`` (the
    kernel slices them; it does not re-run the nonlinearities);
    ``dhs_t [L, B, H]`` f32 per-step output cotangents;
    ``dhf/dcf [B, H]`` f32 final-state cotangents. Returns
    ``(dxs_t [L, B, I], dwcat [I+H, 4H], db [4H], dh0, dc0)`` — all f32.

    ``res_stride/res_offset`` (and ``xs_stride/xs_offset`` for ``xs_t``)
    address one layer inside layer-stacked residual arrays without a copy:
    row ``t`` of the layer lives at row ``t*stride + offset`` of a
    ``[L*stride, B, .]`` array (the fused decoder forward emits
    ``[L, n, B, .]`` streams, reshaped to ``[L*n, B, .]``).

    Used by the ``lstm_sequence_pallas`` VJP and by the large-shape decoder
    backward (``ops/decoder_cv.py``): the decoder's token feedback carries no
    gradient, so its backward decomposes into exactly this per-layer kernel.
    """
    B, H = h0.shape
    L = hs_t.shape[0] // res_stride
    I = xs_t.shape[-1]
    BB = _block_rows(H, B)
    grid = (pl.cdiv(B, BB), L)
    G = _gate_blocks(I, H, _dtype_wbytes(w.dtype))
    if G == 0:
        raise ValueError(
            f"shape unsupported (input={I}, hidden={H}): no gate-block count "
            "fits the VMEM per-buffer limit; check pallas_seq_supported "
            "before calling")

    def rev(ib, tg):
        return ((L - 1 - tg) * res_stride + res_offset, ib, 0)

    def rev_prev(ib, tg):
        return (jnp.maximum(L - 2 - tg, 0) * res_stride + res_offset, ib, 0)

    def rev_xs(ib, tg):
        return ((L - 1 - tg) * xs_stride + xs_offset, ib, 0)

    tbr = lambda wdt: pl.BlockSpec((1, BB, wdt), rev, memory_space=pltpu.VMEM)
    tbp = lambda wdt: pl.BlockSpec((1, BB, wdt), rev_prev, memory_space=pltpu.VMEM)
    tbx = lambda wdt: pl.BlockSpec((1, BB, wdt), rev_xs, memory_space=pltpu.VMEM)
    # dxs / dhs are always dense [L, B, .] streams (layer-local)
    tbd = lambda wdt: pl.BlockSpec((1, BB, wdt),
                                   lambda ib, tg: (L - 1 - tg, ib, 0),
                                   memory_space=pltpu.VMEM)
    row = lambda wdt: pl.BlockSpec((BB, wdt), lambda ib, tg: (ib, 0),
                                   memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda ib, tg: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)

    scratch = [pltpu.VMEM((BB, H), jnp.float32),
               pltpu.VMEM((BB, H), jnp.float32)]
    if G == 1:
        dxs_t, dwx_t, dwh_t, db, dh0, dc0 = pl.pallas_call(
            functools.partial(_bwd_kernel, H, I),
            grid=grid,
            in_specs=[
                tbr(4 * H),  # gates_t
                tbr(H),      # cs (c_t)
                tbp(H),      # cs_prev
                tbp(H),      # hs_prev
                tbx(I),      # xs
                row(H), row(H),              # h0, c0
                const((I + H, 4 * H)),       # w
                tbd(H),                      # dhs
                row(H), row(H),              # dhf, dcf
            ],
            out_specs=(
                tbd(I),                       # dxs (time-major, reversed writes)
                const((I, 4 * H)),            # dWx^T-layout [I, 4H]
                const((H, 4 * H)),            # dWh^T-layout [H, 4H]
                const((1, 4 * H)),            # dbias
                row(H), row(H),               # dh0, dc0
            ),
            out_shape=(
                jax.ShapeDtypeStruct((L, B, I), jnp.float32),
                jax.ShapeDtypeStruct((I, 4 * H), jnp.float32),
                jax.ShapeDtypeStruct((H, 4 * H), jnp.float32),
                jax.ShapeDtypeStruct((1, 4 * H), jnp.float32),
                jax.ShapeDtypeStruct((B, H), jnp.float32),
                jax.ShapeDtypeStruct((B, H), jnp.float32),
            ),
            scratch_shapes=scratch,
            interpret=interpret,
        )(gates_t, cs_t, cs_t, hs_t, xs_t, h0, c0, w, dhs_t, dhf, dcf)
    else:
        HG = 4 * H // G
        w_blocks = [w[:, g * HG:(g + 1) * HG] for g in range(G)]
        outs = pl.pallas_call(
            functools.partial(_bwd_kernel_blk, H, I, G),
            grid=grid,
            in_specs=[tbr(4 * H), tbr(H), tbp(H), tbp(H), tbx(I),
                      row(H), row(H)]
            + [const((I + H, HG)) for _ in range(G)]
            + [tbd(H), row(H), row(H)],
            out_specs=(tbd(I),)
            + tuple(const((I, HG)) for _ in range(G))
            + tuple(const((H, HG)) for _ in range(G))
            + (const((1, 4 * H)), row(H), row(H)),
            out_shape=(jax.ShapeDtypeStruct((L, B, I), jnp.float32),)
            + tuple(jax.ShapeDtypeStruct((I, HG), jnp.float32)
                    for _ in range(G))
            + tuple(jax.ShapeDtypeStruct((H, HG), jnp.float32)
                    for _ in range(G))
            + (jax.ShapeDtypeStruct((1, 4 * H), jnp.float32),
               jax.ShapeDtypeStruct((B, H), jnp.float32),
               jax.ShapeDtypeStruct((B, H), jnp.float32)),
            scratch_shapes=scratch,
            compiler_params=_BLK_COMPILER_PARAMS,
            interpret=interpret,
        )(gates_t, cs_t, cs_t, hs_t, xs_t, h0, c0, *w_blocks,
          dhs_t, dhf, dcf)
        dxs_t = outs[0]
        dwx_t = jnp.concatenate(outs[1:1 + G], axis=1)
        dwh_t = jnp.concatenate(outs[1 + G:1 + 2 * G], axis=1)
        db, dh0, dc0 = outs[1 + 2 * G:]

    dwcat = jnp.concatenate([dwx_t, dwh_t], axis=0)  # [I+H, 4H]
    return dxs_t, dwcat, db[0], dh0, dc0


def _bwd_rule(dtype, interpret, residuals, cotangents):
    params, xs, h0, c0, hs_t, cs_t, gates_t = residuals
    dhs, (dhf, dcf) = cotangents
    I = xs.shape[-1]

    w = jnp.concatenate([params["Wx"].T, params["Wh"].T], axis=0).astype(dtype)
    xs_t = jnp.swapaxes(xs, 0, 1).astype(dtype)
    dhs_t = jnp.swapaxes(dhs, 0, 1).astype(jnp.float32)

    dxs_t, dwcat, db, dh0, dc0 = lstm_seq_bwd_pallas_tm(
        w, xs_t, h0, c0, hs_t, cs_t, gates_t, dhs_t,
        dhf.astype(jnp.float32), dcf.astype(jnp.float32), interpret)

    dparams = {"Wx": dwcat[:I].T, "Wh": dwcat[I:].T, "bias": db}
    # custom_vjp contract: cotangent dtypes must MATCH the primal inputs'.
    # The kernel accumulates dxs in f32; with bf16 xs (a bf16 inter-layer
    # activation feeding this layer) an uncast f32 cotangent poisons the
    # upstream transpose — e.g. inter-layer dropout's `div` transpose rule
    # rejects (f32 cotangent, bf16 divisor) with a TypeError (found by
    # benchmarks/encoder_fallback_cost.py on --apply_dropout bf16).
    dxs = jnp.swapaxes(dxs_t, 0, 1).astype(xs.dtype)
    return dparams, dxs, dh0, dc0


lstm_sequence_pallas.defvjp(_fwd_rule, _bwd_rule)
