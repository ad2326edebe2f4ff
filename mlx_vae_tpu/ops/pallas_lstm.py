"""Fused Pallas LSTM gate kernel.

The LSTM cell's elementwise tail (4 activations + cell/hidden update) is
memory-bound: done naively it is ~10 separate VPU ops each re-reading HBM.
This kernel performs the whole update in a single VMEM pass over the
pre-activation gates, with a matching fused backward kernel (custom VJP) that
recomputes activations from the saved residuals (gates, c_prev) instead of
storing eight intermediate arrays.

The two MXU matmuls (x@Wx^T, h@Wh^T) are deliberately left to XLA — the MXU
path there is already speed-of-light; the win is fusing the VPU tail.

Math (gate order i, f, g, o — matches ``ops/lstm.py``):
    c' = σ(f)·c + σ(i)·tanh(g)
    h' = σ(o)·tanh(c')
Backward, given (dh, dc_out):
    dc_t = dc_out + dh·σ(o)·(1 − tanh²(c'))
    d_o  = dh·tanh(c')·σ(o)(1−σ(o))
    d_f  = dc_t·c·σ(f)(1−σ(f))
    d_i  = dc_t·tanh(g)·σ(i)(1−σ(i))
    d_g  = dc_t·σ(i)·(1−tanh²(g))
    dc_prev = dc_t·σ(f)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the live in/out blocks of one grid step (the pipeline
# double-buffers them, so actual use is ~2x this). Rows per block are derived
# from the feature widths so large hidden sizes (e.g. H=1024 -> 4H=4096)
# still fit the ~16MB of VMEM.
_VMEM_BLOCK_BUDGET = 6 * 1024 * 1024


def _block_rows(widths) -> int:
    bytes_per_row = sum(widths) * 4  # f32
    rows = _VMEM_BLOCK_BUDGET // (2 * bytes_per_row)
    rows = max(8, min(256, (rows // 8) * 8))  # 8-row f32 sublane granularity
    return rows


def pallas_supported(gates_shape, c_shape) -> bool:
    """The kernel needs 2D [B, 4H]/[B, H] blocks with lane-aligned H."""
    if len(gates_shape) != 2 or len(c_shape) != 2:
        return False
    b, h = c_shape
    return h % 128 == 0 and gates_shape == (b, 4 * h)


def _fwd_kernel(gates_ref, c_ref, h_out_ref, c_out_ref):
    h = c_ref.shape[-1]
    g_all = gates_ref[:]
    i = jax.nn.sigmoid(g_all[:, :h])
    f = jax.nn.sigmoid(g_all[:, h : 2 * h])
    g = jnp.tanh(g_all[:, 2 * h : 3 * h])
    o = jax.nn.sigmoid(g_all[:, 3 * h :])
    c_new = f * c_ref[:] + i * g
    h_out_ref[:] = o * jnp.tanh(c_new)
    c_out_ref[:] = c_new


def _bwd_kernel(gates_ref, c_ref, dh_ref, dc_ref, dgates_ref, dcprev_ref):
    h = c_ref.shape[-1]
    g_all = gates_ref[:]
    i = jax.nn.sigmoid(g_all[:, :h])
    f = jax.nn.sigmoid(g_all[:, h : 2 * h])
    g = jnp.tanh(g_all[:, 2 * h : 3 * h])
    o = jax.nn.sigmoid(g_all[:, 3 * h :])
    c_prev = c_ref[:]
    c_new = f * c_prev + i * g
    tc = jnp.tanh(c_new)
    dh = dh_ref[:]
    dc_t = dc_ref[:] + dh * o * (1.0 - tc * tc)
    d_i = dc_t * g * i * (1.0 - i)
    d_f = dc_t * c_prev * f * (1.0 - f)
    d_g = dc_t * i * (1.0 - g * g)
    d_o = dh * tc * o * (1.0 - o)
    dgates_ref[:] = jnp.concatenate([d_i, d_f, d_g, d_o], axis=1)
    dcprev_ref[:] = dc_t * f


def _row_blocked_call(kernel, n_in, n_out, b, widths, dtype, interpret):
    """pallas_call helper: 1D grid over row-blocks, full feature width."""
    block_b = min(_block_rows(widths), b)
    grid = (pl.cdiv(b, block_b),)

    def spec(w):
        return pl.BlockSpec((block_b, w), lambda ib: (ib, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(w) for w in widths[:n_in]],
        out_specs=tuple(spec(w) for w in widths[n_in:]) if n_out > 1 else spec(widths[n_in]),
        out_shape=(
            tuple(jax.ShapeDtypeStruct((b, w), dtype) for w in widths[n_in:])
            if n_out > 1
            else jax.ShapeDtypeStruct((b, widths[n_in]), dtype)
        ),
        interpret=interpret,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_lstm_gates(gates: jnp.ndarray, c: jnp.ndarray, interpret: bool = False):
    h, c_new = _fused_fwd_impl(gates, c, interpret)
    return h, c_new


def _fused_fwd_impl(gates, c, interpret):
    b, hdim = c.shape
    call = _row_blocked_call(
        _fwd_kernel, n_in=2, n_out=2, b=b,
        widths=(4 * hdim, hdim, hdim, hdim),
        dtype=jnp.float32, interpret=interpret,
    )
    return call(gates.astype(jnp.float32), c.astype(jnp.float32))


def _fused_fwd(gates, c, interpret):
    h, c_new = _fused_fwd_impl(gates, c, interpret)
    return (h, c_new), (gates, c)


def _fused_bwd(interpret, residuals, cotangents):
    gates, c = residuals
    dh, dc = cotangents
    b, hdim = c.shape
    call = _row_blocked_call(
        _bwd_kernel, n_in=4, n_out=2, b=b,
        widths=(4 * hdim, hdim, hdim, hdim, 4 * hdim, hdim),
        dtype=jnp.float32, interpret=interpret,
    )
    dgates, dcprev = call(
        gates.astype(jnp.float32), c.astype(jnp.float32),
        dh.astype(jnp.float32), dc.astype(jnp.float32),
    )
    return dgates, dcprev


fused_lstm_gates.defvjp(_fused_fwd, _fused_bwd)
