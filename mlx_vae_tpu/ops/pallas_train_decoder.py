"""Fused Pallas training decoder (forward + hand-written backward), N layers.

The teacher-forced autoregressive decoder is the largest block of the train
step: per timestep it runs an embedding lookup, ``num_layers`` LSTM cells,
the vocab projection, an argmax, and the teacher-forcing select — L scan
iterations of small ops. This module fuses the whole sequence into one
forward kernel (grid ``(batch_blocks, L)``, state in VMEM scratch, weights
VMEM-resident) plus one reverse-time backward kernel that accumulates ALL
weight gradients (every LSTM layer, vocab projection, embedding table) into
constant-index VMEM blocks — the same design as ``ops/pallas_seq_lstm.py``
extended with the token-feedback path.

Layers are generalized with stacked weights and a static Python unroll
inside the kernel (the same scheme as the generation kernel,
``ops/pallas_decoder.py``): layer 0 keeps its own ``[K0+H, 4H]`` combined
weight (embedding+condition input rows), layers 1..n-1 share a stacked
``[n-1, 2H, 4H]`` tensor.

Two entry points share the kernels (a ``with_ce`` specialization flag):

* ``decoder_train_pallas`` — returns logits ``[B, L, V]``;
* ``decoder_train_ce_pallas`` — returns per-sample reconstruction CE ``[B]``
  with logits never touching HBM in either direction (the backward
  recomputes softmax from the stored top-layer states and forms
  ``dlogits = (softmax - onehot) * dce`` in-register).

Gradient semantics match the scan decoder exactly: the fed-back token
carries no gradient (ints), so the backward is ``n`` stacked LSTM chains +
the output projection, with the embedding gradient scattered via the stored
input-token one-hots (a matmul, not a scatter).

Supported: lane-aligned hidden size and a VMEM-budget estimate over the
resident weights + gradient accumulators (``_vmem_estimate``); callers fall
back to ``models.decoder.decoder_apply``'s scan. Replaces (capability-wise)
the reference's per-token Python loop
``/root/reference/models/decoder.py:152-185``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Empirical VMEM budget for the backward kernel's resident set (weights +
# gradient accumulators + streamed blocks). Measured on v5e (B=1024, L=64,
# bf16, 3 trials each — docs/DESIGN.md "N-layer fused decoder"): every
# config up to est=58MB (H=512/n=4) compiles and beats the scan fallback
# 1.7-2.0x; est=93MB (H=1024/n=2) fails Mosaic compilation outright. 64MB
# sits safely under the failure point.
_VMEM_BUDGET = 64 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _block_rows(H: int, n: int, B: int) -> int:
    """Batch rows per block — a measured table (v5e, B=1024+): bigger blocks
    amortize the VMEM-resident weights over more rows, until the streamed
    per-step blocks push the kernel over the compile ceiling.

    * H<=256, n<=2: BB=512 (+4% over 256 on the default-config bench)
    * H<=256, n<=4: BB=256 (12.03 vs 12.58ms at H=256/4L)
    * H<=512, n<=2: BB=256 (18.59 vs 20.15ms at H=512/2L)
    * else: BB=128 (BB=256 at H=512/4L fails Mosaic compilation)
    """
    # token arrays are blocked (8, BB): Mosaic needs BB % 128 == 0 (or == B)
    if H <= 256 and n <= 2:
        rows = 512
    elif (H <= 256 and n <= 4) or (H <= 512 and n <= 2):
        rows = 256
    else:
        rows = 128
    return min(rows, B)


def _vmem_estimate(cfg, BB: int) -> int:
    """Rough bytes of the backward kernel's VMEM-resident set."""
    H, E, C, n = (cfg.hidden_dim, cfg.embedding_dim, cfg.num_conditions,
                  cfg.num_layers)
    Vp = _round_up(cfg.vocab_size, 128)
    K0 = _round_up(E + C, 128)
    wb = 2 if cfg.compute_dtype == "bfloat16" else 4
    nr = max(n - 1, 1)
    weights = ((K0 + H) * 4 * H + nr * 2 * H * 4 * H + H * Vp + Vp * E) * wb
    dW = ((K0 + H) * 4 * H + nr * 2 * H * 4 * H + H * Vp + Vp * E
          + n * 4 * H + Vp) * 4
    # streamed per-t blocks (hs/cs prev-only + gates + dlog), double-buffered;
    # the cur hs/cs are carried in scratch (single-fetch streaming) with a
    # const last-step seed block resident
    streams = 2 * (2 * n * BB * H * wb + n * BB * 4 * H * wb + BB * Vp * 4)
    seed_blocks = 2 * n * BB * H * wb
    scratch = 2 * n * BB * H * 4 + 2 * n * BB * H * wb
    return weights + dW + streams + seed_blocks + scratch


def pallas_train_decoder_supported(cfg, batch: int) -> bool:
    if not (1 <= cfg.num_layers <= 8 and cfg.hidden_dim % 128 == 0
            and batch % 8 == 0):
        return False
    BB = _block_rows(cfg.hidden_dim, cfg.num_layers, batch)
    return _vmem_estimate(cfg, BB) <= _VMEM_BUDGET


def _acts(gates, H):
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    return i, f, g, o


def _split_acts(acts, H):
    """Slice stored ACTIVATED gates ``[i, f, g, o]`` (the residual-stream
    contract: forwards store post-nonlinearity gates so backwards never
    re-run 3 sigmoids + a tanh over the 4H axis).

    bf16 caveat (documented tradeoff): a saturated gate activation rounds
    to exactly 1.0 in a bf16 residual, so its ``a*(1-a)`` derivative term
    is exactly 0 where the pre-activation contract would have kept a
    ~1e-3-scale gradient. Saturated gates carry near-zero gradient either
    way; the flush-to-zero is systematic but small, and bf16 training
    converges comparably (30-epoch demo runs before/after). f32 residuals
    are exact."""
    return (acts[..., :H], acts[..., H:2 * H], acts[..., 2 * H:3 * H],
            acts[..., 3 * H:])


# ----------------------------------------------------------------- forward


def _fwd_kernel(n, H, Vp, K0, start_token, with_ce,
                targets_ref, tf_ref, cond_ref, h0_ref,
                emb_ref, w0_ref, wr_ref, bs_ref, wout_ref, bout_ref,
                out0_ref, toks_ref, hs_ref, cs_ref, gs_ref,
                h_s, c_s, tok_s):
    """``out0_ref`` is the logits stream (``with_ce=False``) or the
    per-sample CE accumulator (``with_ce=True``)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_s[:] = jnp.broadcast_to(h0_ref[:][None], h_s.shape)
        c_s[:] = jnp.zeros_like(c_s)
        tok_s[:] = jnp.full_like(tok_s, start_token)
        if with_ce:
            out0_ref[:] = jnp.zeros_like(out0_ref)

    BB = tok_s.shape[0]
    tok = tok_s[:]
    # token arrays are [L, B] blocked (8, BB) in time (Mosaic requires %8
    # sublanes); row t % 8 is this step's slot.
    trow = t % 8
    toks_ref[trow] = tok[:, 0]  # record the input token for the backward pass

    col = jax.lax.broadcasted_iota(jnp.int32, (BB, Vp), 1)
    oh = (col == tok).astype(emb_ref.dtype)
    emb_x = jnp.dot(oh, emb_ref[:], preferred_element_type=jnp.float32)
    cond = cond_ref[:].astype(jnp.float32)
    pad = K0 - emb_x.shape[1] - cond.shape[1]
    x0 = jnp.concatenate([emb_x, cond, jnp.zeros((BB, pad), jnp.float32)], axis=1)

    x = x0
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

    logits = jnp.dot(x.astype(wout_ref.dtype), wout_ref[:],
                     preferred_element_type=jnp.float32) + bout_ref[0]

    target_t = targets_ref[trow][:, None]
    if with_ce:
        # per-step CE accumulation (target of THIS step); the -1e9 pad-lane
        # bias makes pad lanes vanish from the log-sum-exp.
        m = jnp.max(logits, axis=1, keepdims=True)
        lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=1, keepdims=True))
        tlogit = jnp.sum(jnp.where(col == target_t, logits, 0.0), axis=1,
                         keepdims=True)
        out0_ref[:] += lse - tlogit
    else:
        out0_ref[0] = logits

    pred = jnp.argmax(logits, axis=1).astype(jnp.int32)[:, None]
    tok_s[:] = jnp.where(tf_ref[t, 0] != 0, target_t, pred)


def _fwd_kernel_blk(n, H, Vp, K0, G0, G, start_token, *refs):
    """Gate-axis-blocked forward for hidden sizes whose weights exceed the
    single-buffer Mosaic limit (H>=768): per-(layer, gate) weight blocks,
    same math and residual streams as ``_fwd_kernel`` (no CE variant — at
    these sizes the vocab projection is a rounding error of the step)."""
    targets_ref, tf_ref, cond_ref, h0_ref, emb_ref = refs[:5]
    w0_refs = refs[5:5 + G0]
    nr = max(n - 1, 0)
    wr_refs = refs[5 + G0:5 + G0 + nr * G]
    k = 5 + G0 + nr * G
    bs_ref, wout_ref, bout_ref = refs[k:k + 3]
    out0_ref, toks_ref, hs_ref, cs_ref, gs_ref = refs[k + 3:k + 8]
    h_s, c_s, tok_s = refs[k + 8:]
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_s[:] = jnp.broadcast_to(h0_ref[:][None], h_s.shape)
        c_s[:] = jnp.zeros_like(c_s)
        tok_s[:] = jnp.full_like(tok_s, start_token)

    BB = tok_s.shape[0]
    tok = tok_s[:]
    trow = t % 8
    toks_ref[trow] = tok[:, 0]

    col = jax.lax.broadcasted_iota(jnp.int32, (BB, Vp), 1)
    oh = (col == tok).astype(emb_ref.dtype)
    emb_x = jnp.dot(oh, emb_ref[:], preferred_element_type=jnp.float32)
    cond = cond_ref[:].astype(jnp.float32)
    pad = K0 - emb_x.shape[1] - cond.shape[1]
    x0 = jnp.concatenate([emb_x, cond, jnp.zeros((BB, pad), jnp.float32)],
                         axis=1)

    x = x0
    for l in range(n):  # static unroll over layers
        blocks = w0_refs if l == 0 else wr_refs[(l - 1) * G:l * G]
        inp = jnp.concatenate([x, h_s[l]], axis=1).astype(blocks[0].dtype)
        parts = [jnp.dot(inp, b[:], preferred_element_type=jnp.float32)
                 for b in blocks]
        gates = jnp.concatenate(parts, axis=1) + bs_ref[l, 0]
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

    logits = jnp.dot(x.astype(wout_ref.dtype), wout_ref[:],
                     preferred_element_type=jnp.float32) + bout_ref[0]
    out0_ref[0] = logits

    target_t = targets_ref[trow][:, None]
    pred = jnp.argmax(logits, axis=1).astype(jnp.int32)[:, None]
    tok_s[:] = jnp.where(tf_ref[t, 0] != 0, target_t, pred)


def _fwd_blk_gate_blocks(cfg):
    """(G0, G) gate-block counts for layer 0 / recurrent layers (0 = no
    blocking fits)."""
    from mlx_vae_tpu.ops.pallas_seq_lstm import _gate_blocks
    K0 = _round_up(cfg.embedding_dim + cfg.num_conditions, 128)
    wb = 2 if cfg.compute_dtype == "bfloat16" else 4
    G0 = _gate_blocks(K0, cfg.hidden_dim, wb)
    G = _gate_blocks(cfg.hidden_dim, cfg.hidden_dim, wb) \
        if cfg.num_layers > 1 else 1
    return G0, G


def fwd_blk_supported(cfg, batch: int) -> bool:
    """Whether the blocked forward compiles for this shape (VMEM estimate:
    resident weights + streamed blocks + state scratch, leaving ~30MB of the
    112MB per-kernel limit for Mosaic's unrolled-matmul stack)."""
    H, E, C, n = (cfg.hidden_dim, cfg.embedding_dim, cfg.num_conditions,
                  cfg.num_layers)
    if not (1 <= n <= 8 and H % 128 == 0 and batch % 8 == 0):
        return False
    G0, G = _fwd_blk_gate_blocks(cfg)
    if G0 == 0 or G == 0:
        return False
    Vp = _round_up(cfg.vocab_size, 128)
    K0 = _round_up(E + C, 128)
    wb = 2 if cfg.compute_dtype == "bfloat16" else 4
    BB = _block_rows(H, n, batch)
    weights = ((K0 + H) * 4 * H + max(n - 1, 0) * 2 * H * 4 * H
               + H * Vp + Vp * E) * wb
    streams = 2 * (2 * n * BB * H * wb + n * BB * 4 * H * wb + BB * Vp * 4)
    scratch = 2 * n * BB * H * 4
    return weights + streams + scratch <= 80 * 1024 * 1024


def decoder_fwd_blk(params, cfg, h_init, conditions, target_seq, tf_mask,
                    interpret: bool = False):
    """Blocked fused forward -> ``(logits [B, L, V], (toks_t [L, B],
    hs, cs, gs))`` with layer-stacked ``[L, n, B, .]`` residual streams
    (consumed by ``ops/decoder_cv.py``'s per-layer Pallas backward)."""
    B, L = target_seq.shape
    H, E, C, n = (cfg.hidden_dim, cfg.embedding_dim, cfg.num_conditions,
                  cfg.num_layers)
    Vp = _round_up(cfg.vocab_size, 128)
    K0 = _round_up(E + C, 128)
    dtype = cfg.dtype
    G0, G = _fwd_blk_gate_blocks(cfg)

    emb, w0, wr, bs, wout, bout = _prep_weights(params, cfg, Vp, K0, dtype)
    HG0 = 4 * H // G0
    HG = 4 * H // G
    w0_blocks = [w0[:, g * HG0:(g + 1) * HG0] for g in range(G0)]
    wr_blocks = [wr[l][:, g * HG:(g + 1) * HG]
                 for l in range(max(n - 1, 0)) for g in range(G)]

    Lp = _round_up(L, 8)
    targets_t = jnp.zeros((Lp, B), jnp.int32).at[:L].set(
        jnp.swapaxes(target_seq.astype(jnp.int32), 0, 1))
    tf_i = tf_mask.astype(jnp.int32).reshape(L, 1)
    cond_f = conditions.astype(jnp.float32)

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
        functools.partial(_fwd_kernel_blk, n, H, Vp, K0, G0, G,
                          cfg.start_token),
        grid=grid,
        in_specs=[
            tb2,                                    # targets [Lp, B]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf flags [L, 1]
            row(C), row(H),
            const((Vp, E)),
        ]
        + [const((K0 + H, HG0)) for _ in range(G0)]
        + [const((2 * H, HG)) for _ in range(max(n - 1, 0) * G)]
        + [const((n, 1, 4 * H)), const((H, Vp)), const((1, Vp))],
        out_specs=(
            pl.BlockSpec((1, BB, Vp), lambda ib, t: (t, ib, 0),
                         memory_space=pltpu.VMEM),
            tb2, tb(H), tb(H), tb(4 * H)),
        out_shape=(
            jax.ShapeDtypeStruct((L, B, Vp), jnp.float32),
            jax.ShapeDtypeStruct((Lp, B), jnp.int32),      # input tokens
            jax.ShapeDtypeStruct((L, n, B, H), dtype),     # hs
            jax.ShapeDtypeStruct((L, n, B, H), dtype),     # cs
            jax.ShapeDtypeStruct((L, n, B, 4 * H), dtype),  # gates
        ),
        scratch_shapes=[pltpu.VMEM((n, BB, H), jnp.float32)] * 2
        + [pltpu.VMEM((BB, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(targets_t, tf_i, cond_f, h_init, emb, *w0_blocks, *wr_blocks,
      bs, wout, bout)

    logits_t, toks_t, hs, cs, gs = outs
    logits = jnp.swapaxes(logits_t, 0, 1)[:, :, :cfg.vocab_size]
    return logits, (toks_t[:L], hs, cs, gs)


# ---------------------------------------------------------------- backward


def _bwd_kernel(n, H, Vp, E, C, K0, with_ce,
                din_ref, targets_ref, toks_ref, cond_ref, h0_ref,
                hlast_ref, clast_ref, gs_ref, hsp_ref, csp_ref,
                emb_ref, w0_ref, wr_ref, wout_ref, bout_ref,
                dw0_ref, dwr_ref, dbs_ref, dwout_ref, dbout_ref, demb_ref,
                dhinit_ref, dcond_ref,
                dh_s, dc_s, hcur_s, ccur_s):
    """``din_ref`` is the dlogits stream (``with_ce=False``) or the
    per-sample dce column (``with_ce=True``, logits recomputed from the
    stored top-layer h).

    Single-fetch residual streaming: the hs/cs streams used to be read
    TWICE per step (current t and previous t-1 blocks). Walking time
    backwards, step ``tg``'s previous block IS step ``tg+1``'s current
    block — so only the t-1 stream (``hsp/csp``) is fetched, the current
    values live in the ``hcur_s/ccur_s`` scratch carried between grid
    steps (seeded from the const ``hlast/clast`` block at tg=0), and the
    end of each step rolls the just-fetched prev block into the scratch.
    Halves the hs/cs read bandwidth with bitwise-identical math."""
    tg = pl.program_id(1)
    L = pl.num_programs(1)
    t = L - 1 - tg
    ib = pl.program_id(0)

    @pl.when(jnp.logical_and(ib == 0, tg == 0))
    def _():
        dw0_ref[:] = jnp.zeros_like(dw0_ref)
        dwr_ref[:] = jnp.zeros_like(dwr_ref)
        dbs_ref[:] = jnp.zeros_like(dbs_ref)
        dwout_ref[:] = jnp.zeros_like(dwout_ref)
        dbout_ref[:] = jnp.zeros_like(dbout_ref)
        demb_ref[:] = jnp.zeros_like(demb_ref)

    @pl.when(tg == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = jnp.zeros_like(dc_s)
        dcond_ref[:] = jnp.zeros_like(dcond_ref)
        hcur_s[:] = hlast_ref[0]
        ccur_s[:] = clast_ref[0]

    BB = dh_s.shape[1]
    first = (t == 0)
    trow = t % 8
    col = jax.lax.broadcasted_iota(jnp.int32, (BB, Vp), 1)

    # ---- output projection (dlogits from the stream, or recomputed CE) ----
    h_top = hcur_s[n - 1].astype(jnp.float32)
    if with_ce:
        logits = jnp.dot(h_top.astype(wout_ref.dtype), wout_ref[:],
                         preferred_element_type=jnp.float32) + bout_ref[0]
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        probs = e / jnp.sum(e, axis=1, keepdims=True)
        target_t = targets_ref[trow][:, None]
        onehot_t = (col == target_t).astype(jnp.float32)
        dlog = (probs - onehot_t) * din_ref[:]  # [BB, Vp] * [BB, 1]
    else:
        dlog = din_ref[0]

    from_above = jax.lax.dot_general(
        dlog.astype(wout_ref.dtype), wout_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwout_ref[:] += jax.lax.dot_general(
        h_top.astype(wout_ref.dtype), dlog.astype(wout_ref.dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dbout_ref[0] += jnp.sum(dlog, axis=0)

    # ---- LSTM stack, top layer down (static unroll) ----
    for l in range(n - 1, -1, -1):
        a_all = gs_ref[0, l].astype(jnp.float32)
        i_, f_, g_, o_ = _split_acts(a_all, H)
        c_prev = jnp.where(first, 0.0, csp_ref[0, l].astype(jnp.float32))
        h_prev = jnp.where(first, h0_ref[:], hsp_ref[0, l].astype(jnp.float32))
        tc = jnp.tanh(ccur_s[l].astype(jnp.float32))
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
            # input to layer l is layer l-1's output at THIS step
            x_in = hcur_s[l - 1].astype(jnp.float32)
            inp = jnp.concatenate([x_in, h_prev], axis=1).astype(w_l.dtype)
            dwr_ref[l - 1] += jax.lax.dot_general(
                inp, dgates, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            from_above = dinp[:, :H]
            dh_s[l] = dinp[:, H:]
        else:
            # rebuild x0 = [emb, cond, pad] from the stored input token
            tok = toks_ref[trow][:, None]
            oh = (col == tok).astype(emb_ref.dtype)
            emb_x = jnp.dot(oh, emb_ref[:], preferred_element_type=jnp.float32)
            cond = cond_ref[:].astype(jnp.float32)
            pad = K0 - E - C
            x0 = jnp.concatenate([emb_x, cond,
                                  jnp.zeros((BB, pad), jnp.float32)], axis=1)
            inp0 = jnp.concatenate([x0, h_prev], axis=1).astype(w_l.dtype)
            dw0_ref[:] += jax.lax.dot_general(
                inp0, dgates, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            demb_ref[:] += jax.lax.dot_general(
                oh, dinp[:, :E].astype(emb_ref.dtype),
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            dcond_ref[:] += dinp[:, E:E + C]
            dh_s[0] = dinp[:, K0:]

    # roll the just-fetched t-1 block into the "current" scratch for the
    # next grid step (which computes time t-1)
    hcur_s[:] = hsp_ref[0]
    ccur_s[:] = csp_ref[0]

    @pl.when(tg == L - 1)
    def _():
        # every layer's h_prev at t=0 is the shared h_init
        dhinit_ref[:] = jnp.sum(dh_s[:], axis=0)


# ----------------------------------------------------------------- wrapper


def _prep_weights(params, cfg, Vp, K0, dtype):
    H, E, n = cfg.hidden_dim, cfg.embedding_dim, cfg.num_layers
    emb = jnp.zeros((Vp, E), dtype).at[:cfg.vocab_size].set(
        params["embedding"]["weight"].astype(dtype))
    l0 = params["lstm_layer_0"]
    # w0 stacks [x0 (K0) ; h (H)] rows; x0's real rows are the first E+C.
    w0 = jnp.zeros((K0 + H, 4 * H), dtype)
    w0 = w0.at[: E + cfg.num_conditions].set(l0["Wx"].T.astype(dtype))
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
    wout = jnp.zeros((H, Vp), dtype).at[:, :cfg.vocab_size].set(
        params["fc_out"]["weight"].T.astype(dtype))
    # -1e9 on pad lanes: argmax feedback must never pick them. The pad lanes
    # are sliced off the returned logits, so the loss never sees them.
    bout = jnp.full((1, Vp), -1e9, jnp.float32).at[0, :cfg.vocab_size].set(
        params["fc_out"]["bias"].astype(jnp.float32))
    return emb, w0, wr, bs, wout, bout


def _run_fwd(params, cfg, h_init, conditions, target_seq, interpret, tf_mask,
             with_ce):
    B, L = target_seq.shape
    H, E, C, n = (cfg.hidden_dim, cfg.embedding_dim, cfg.num_conditions,
                  cfg.num_layers)
    Vp = _round_up(cfg.vocab_size, 128)
    K0 = _round_up(E + C, 128)
    dtype = cfg.dtype

    emb, w0, wr, bs, wout, bout = _prep_weights(params, cfg, Vp, K0, dtype)
    Lp = _round_up(L, 8)  # token arrays padded to 8-sublane time blocks
    targets_t = jnp.zeros((Lp, B), jnp.int32).at[:L].set(
        jnp.swapaxes(target_seq.astype(jnp.int32), 0, 1))
    tf_i = tf_mask.astype(jnp.int32).reshape(L, 1)
    cond_f = conditions.astype(jnp.float32)

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

    if with_ce:
        out0_spec = row(1)
        out0_shape = jax.ShapeDtypeStruct((B, 1), jnp.float32)
    else:
        out0_spec = pl.BlockSpec((1, BB, Vp), lambda ib, t: (t, ib, 0),
                                 memory_space=pltpu.VMEM)
        out0_shape = jax.ShapeDtypeStruct((L, B, Vp), jnp.float32)

    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, n, H, Vp, K0, cfg.start_token, with_ce),
        grid=grid,
        in_specs=[
            tb2,                                    # targets [Lp, B]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tf flags [L, 1], whole
            row(C), row(H),
            const((Vp, E)), const((K0 + H, 4 * H)),
            const((max(n - 1, 1), 2 * H, 4 * H)), const((n, 1, 4 * H)),
            const((H, Vp)), const((1, Vp)),
        ],
        out_specs=(out0_spec, tb2, tb(H), tb(H), tb(4 * H)),
        out_shape=(
            out0_shape,
            jax.ShapeDtypeStruct((Lp, B), jnp.int32),      # input tokens
            # residual streams in compute dtype (halves HBM traffic in bf16)
            jax.ShapeDtypeStruct((L, n, B, H), dtype),     # hs
            jax.ShapeDtypeStruct((L, n, B, H), dtype),     # cs
            jax.ShapeDtypeStruct((L, n, B, 4 * H), dtype),  # gates
        ),
        scratch_shapes=[pltpu.VMEM((n, BB, H), jnp.float32)] * 2
        + [pltpu.VMEM((BB, 1), jnp.int32)],
        interpret=interpret,
    )(targets_t, tf_i, cond_f, h_init, emb, w0, wr, bs, wout, bout)

    out0, toks_t, hs, cs, gs = outs
    residuals = (params, h_init, conditions, targets_t, toks_t, hs, cs, gs)
    if with_ce:
        return out0[:, 0], residuals
    return jnp.swapaxes(out0, 0, 1)[:, :, :cfg.vocab_size], residuals


def _run_bwd(cfg, interpret, residuals, din, with_ce):
    params, h_init, conditions, targets_t, toks_t, hs, cs, gs = residuals
    L, n, B, H = hs.shape
    E, C = cfg.embedding_dim, cfg.num_conditions
    Vp = _round_up(cfg.vocab_size, 128)
    K0 = _round_up(E + C, 128)
    dtype = cfg.dtype

    emb, w0, wr, _, wout, bout = _prep_weights(params, cfg, Vp, K0, dtype)
    cond_f = conditions.astype(jnp.float32)

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
    # constant-per-ib block of the LAST time step (seeds the current-state
    # scratch; see _bwd_kernel's single-fetch streaming note)
    tlast = lambda w_: pl.BlockSpec((1, n, BB, w_),
                                    lambda ib, tg: (L - 1, 0, ib, 0),
                                    memory_space=pltpu.VMEM)
    tbr2 = pl.BlockSpec((8, BB), rev2, memory_space=pltpu.VMEM)
    row = lambda w_: pl.BlockSpec((BB, w_), lambda ib, tg: (ib, 0),
                                  memory_space=pltpu.VMEM)
    const = lambda s: pl.BlockSpec(s, lambda ib, tg: (0,) * len(s),
                                   memory_space=pltpu.VMEM)

    if with_ce:
        din_spec = row(1)  # dce per sample
        din_arr = din.astype(jnp.float32).reshape(B, 1)
    else:
        din_spec = pl.BlockSpec((1, BB, Vp), lambda ib, tg: (L - 1 - tg, ib, 0),
                                memory_space=pltpu.VMEM)
        din_arr = jnp.zeros((L, B, Vp), jnp.float32).at[:, :, :cfg.vocab_size].set(
            jnp.swapaxes(din.astype(jnp.float32), 0, 1))

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n, H, Vp, E, C, K0, with_ce),
        grid=grid,
        in_specs=[
            din_spec, tbr2, tbr2, row(C), row(H),
            tlast(H), tlast(H), tbr(4 * H),
            tbp(H), tbp(H),
            const((Vp, E)), const((K0 + H, 4 * H)),
            const((max(n - 1, 1), 2 * H, 4 * H)),
            const((H, Vp)), const((1, Vp)),
        ],
        out_specs=(
            const((K0 + H, 4 * H)),
            const((max(n - 1, 1), 2 * H, 4 * H)),
            const((n, 1, 4 * H)),
            const((H, Vp)), const((1, Vp)), const((Vp, E)),
            row(H), row(C),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((K0 + H, 4 * H), jnp.float32),       # dw0
            jax.ShapeDtypeStruct((max(n - 1, 1), 2 * H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, 4 * H), jnp.float32),         # dbs
            jax.ShapeDtypeStruct((H, Vp), jnp.float32),               # dwout
            jax.ShapeDtypeStruct((1, Vp), jnp.float32),               # dbout
            jax.ShapeDtypeStruct((Vp, E), jnp.float32),               # demb
            jax.ShapeDtypeStruct((B, H), jnp.float32),                # dh_init
            jax.ShapeDtypeStruct((B, C), jnp.float32),                # dcond
        ),
        scratch_shapes=[pltpu.VMEM((n, BB, H), jnp.float32)] * 2
        + [pltpu.VMEM((n, BB, H), hs.dtype)] * 2,
        interpret=interpret,
    )(din_arr, targets_t, toks_t, cond_f, h_init, hs, cs, gs, hs, cs,
      emb, w0, wr, wout, bout)

    dw0, dwr, dbs, dwout, dbout, demb, dh_init, dcond = outs

    V = cfg.vocab_size
    dparams = {
        "embedding": {"weight": demb[:V]},
        "lstm_layer_0": {"Wx": dw0[: E + C].T, "Wh": dw0[K0:].T,
                         "bias": dbs[0, 0]},
        "fc_out": {"weight": dwout[:, :V].T, "bias": dbout[0, :V]},
        # non-recurrent heads get zero cotangents here; their gradients flow
        # through initialize_hidden_state outside the kernel boundary
        "z_to_hidden": jax.tree_util.tree_map(
            jnp.zeros_like, params["z_to_hidden"]),
        "condition_to_hidden": jax.tree_util.tree_map(
            jnp.zeros_like, params["condition_to_hidden"]),
    }
    for l in range(1, cfg.num_layers):
        dparams[f"lstm_layer_{l}"] = {"Wx": dwr[l - 1, :H].T,
                                      "Wh": dwr[l - 1, H:].T,
                                      "bias": dbs[l, 0]}
    # conditions: the per-step input-concat path (initialize_hidden_state's
    # contribution is added by autodiff outside). Integer/bool inputs get
    # symbolic-zero (float0) cotangents.
    import numpy as _np
    dtargets = _np.zeros((B, hs.shape[0]), dtype=jax.dtypes.float0)
    dtf = _np.zeros((hs.shape[0],), dtype=jax.dtypes.float0)
    return dparams, dh_init, dcond, dtargets, dtf


# ------------------------------------------------------------ entry points


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5))
def decoder_train_pallas(params: dict, cfg, h_init, conditions, target_seq,
                         interpret: bool, tf_mask):
    """Teacher-forced decode -> logits ``[B, L, vocab]`` (fused kernels).

    ``h_init [B, H]`` is the shared per-layer initial hidden state (cell
    states start at zero); ``tf_mask [L] bool`` are the per-step coin flips.
    """
    logits, _ = _run_fwd(params, cfg, h_init, conditions, target_seq,
                         interpret, tf_mask, with_ce=False)
    return logits


def _dec_fwd_rule(params, cfg, h_init, conditions, target_seq, interpret,
                  tf_mask):
    return _run_fwd(params, cfg, h_init, conditions, target_seq, interpret,
                    tf_mask, with_ce=False)


def _dec_bwd_rule(cfg, interpret, residuals, dlogits):
    return _run_bwd(cfg, interpret, residuals, dlogits, with_ce=False)


decoder_train_pallas.defvjp(_dec_fwd_rule, _dec_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5))
def decoder_train_ce_pallas(params: dict, cfg, h_init, conditions, target_seq,
                            interpret: bool, tf_mask):
    """Teacher-forced decode + per-sample reconstruction CE ``[B]``.

    ``ce[b] = sum_t -log softmax(logits_t)[target_t]`` — identical numerics
    to ``decoder_apply`` followed by ``reconstruction_loss(..., 'sum'-per-
    sample)``, but logits never leave VMEM in either direction.
    """
    ce, _ = _run_fwd(params, cfg, h_init, conditions, target_seq, interpret,
                     tf_mask, with_ce=True)
    return ce


def _ce_fwd_rule(params, cfg, h_init, conditions, target_seq, interpret,
                 tf_mask):
    return _run_fwd(params, cfg, h_init, conditions, target_seq, interpret,
                    tf_mask, with_ce=True)


def _ce_bwd_rule(cfg, interpret, residuals, dce):
    return _run_bwd(cfg, interpret, residuals, dce, with_ce=True)


decoder_train_ce_pallas.defvjp(_ce_fwd_rule, _ce_bwd_rule)
