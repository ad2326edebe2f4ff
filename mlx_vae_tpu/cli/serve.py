#!/usr/bin/env python3
"""Molecule-generation server.

A lightweight serving layer over a trained checkpoint — the deployment
surface the reference lacks entirely (its generation is reachable only by
writing Python against ``ARCVAE.generate``). Stdlib-only (``http.server``),
no new dependencies.

Design for the single-accelerator serving reality:

* **Size-tiered warm compiles**: the samplers are jitted at a LADDER of
  batch sizes (``--batch_sizes``, e.g. ``256,2048,8192``) at startup, so no
  request ever pays a compile (remote-TPU compiles take 60-120s) and a
  10-molecule request runs a 256-row pass instead of the largest tier's.
  Requests route to the smallest tier that fits; oversize requests
  decompose into multiple passes (largest tier first, then the smallest
  tier that covers the remainder).
* **One device, one dispatcher**: a single dispatcher thread owns the
  device (JAX dispatch is not re-entrant-safe across threads for one
  chip); handler threads enqueue jobs and wait, so health checks never
  queue behind generation.
* **Request coalescing**: jobs already waiting in the queue are merged
  into ONE device pass at kernel-block granularity when semantics allow.
  The fused sampler takes per-block PRNG seeds and temperatures
  (``ops/pallas_decoder.py``), and each request's rows are padded to block
  alignment with seeds derived from the request's own key + intra-request
  block index — so a request's tokens are bitwise IDENTICAL whether it ran
  solo in the smallest tier or coalesced into a bigger one. Stochastic
  jobs coalesce only on the fused path (the scan sampler's draws are
  batch-position-dependent); greedy jobs always can (argmax is
  row-independent on both paths). Jobs that cannot coalesce run solo —
  still tiered.
* **Checkpoint-embedded stats**: raw property targets are z-scored with
  the train-set stats exactly like ``generate.py`` (``cli/common.py``);
  ``--data`` overrides.

Endpoints::

    GET  /health            -> {"status": "ok", "model": {...}}
    POST /generate          <- {"num_molecules": 1000, "target": [90.0],
                                "temperature": 0.8, "greedy": false,
                                "seed": 0, "return_tokens": false}
                            -> {"selfies": [...], "validity": ..,
                                "uniqueness": .., "mols_per_sec": ..,
                                "passes": .., "coalesced": ..}

``top_k``/``top_p`` are jit-static in the sampler (a distinct program per
value), so truncated sampling is served only for configs declared at
startup with ``--truncation "top_k=K,top_p=P"`` (repeatable) — each is
warm-compiled per tier like the plain samplers, and requests naming any
other config get a 400 listing what is served. Requests above
``--max_molecules`` are rejected rather than queued unboundedly.
"""

from __future__ import annotations

import argparse
import collections
import functools
import json
import math
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np


# ---- pass planning (pure; unit-tested directly) ----

def _cover(rem: int, options: tuple) -> list:
    """Minimal covering of ``rem`` units by tier passes: DP over
    ``options`` of ``(units, rows, tier)`` minimizing lexicographic
    (total device rows, number of passes) with mixed tiers allowed —
    e.g. tiers [8, 32, 128] cover 68 rows as 32+32+8 (3 passes), not
    nine 8-row passes (the homogeneous covering with equal rows but 3x
    the per-pass relay round-trips). Units are scaled by their gcd so
    the DP length is tiers-granular, not row-granular."""
    g = 0
    for u, _, _ in options:
        g = math.gcd(g, u)
    need = -(-rem // g)
    opts = [(u // g, r, t) for u, r, t in options]
    inf = float("inf")
    best = [(0, 0, None, 0)] + [(inf, inf, None, 0)] * need
    for x in range(1, need + 1):
        b = (inf, inf, None, 0)
        for u, r, t in opts:
            prev = best[max(0, x - u)]
            cand = (prev[0] + r, prev[1] + 1, t, max(0, x - u))
            if cand[:2] < b[:2]:
                b = cand
        best[x] = b
    out, x = [], need
    while x > 0:
        _, _, t, x = best[x]
        out.append(t)
    return sorted(out, reverse=True)


def plan_cover(n: int, tiers: tuple) -> tuple:
    """Decompose an n-row job into warm-tier passes minimizing
    lexicographic (total device rows, passes)."""
    return plan_cover_blocks(n, tiers, 1)


@functools.lru_cache(maxsize=4096)
def plan_cover_blocks(nblocks: int, co_tiers: tuple, chunk: int) -> tuple:
    """Tier-pass covering of ``nblocks`` chunk-block units minimizing
    lexicographic (total device rows, passes), mixed tiers allowed.

    Large jobs peel whole largest-tier passes before the DP, but only
    down to ``big + F`` where every unit count >= F/g is exactly
    representable by tier multiples (Erdős–Graham bound 2*(t1/g)*(big/g)
    on the scaled Frobenius number) — peeling inside that region is
    provably rows-minimal, unlike a blind peel-to-big, which on a
    non-divisible ladder like (8, 12) would plan 16 rows as 12+8 instead
    of 8+8. Pathological ladders whose bound would blow the DP domain
    (>500k states) fall back to peel-to-big."""
    caps = {t: t // chunk for t in co_tiers}
    big = co_tiers[-1]
    cb = caps[big]
    g = 0
    for t in co_tiers:
        g = math.gcd(g, caps[t])
    stop = cb + 2 * (caps[co_tiers[0]] // g) * (cb // g) * g
    if stop // g > 500_000:
        stop = cb
    plan, rem = [], nblocks
    while rem >= max(stop, cb):
        plan.append(big)
        rem -= cb
    if rem:
        plan.extend(_cover(rem, tuple((caps[t], t, t) for t in co_tiers)))
    return tuple(plan)


def build_parser():
    p = argparse.ArgumentParser(description="Serve molecule generation over HTTP")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--data", type=str, default=None,
                   help="Dataset JSON (stats + alphabet; else from checkpoint)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--batch_size", type=int, default=4096,
                   help="Largest jit batch tier (back-compat single-tier "
                        "form of --batch_sizes)")
    p.add_argument("--batch_sizes", type=str, default=None,
                   help="Comma-separated warm batch tiers, e.g. "
                        "'256,2048,8192'. Requests route to the smallest "
                        "tier that fits; overrides --batch_size")
    p.add_argument("--max_length", type=int, default=64)
    p.add_argument("--max_molecules", type=int, default=1_000_000,
                   help="Reject larger requests instead of queueing them")
    p.add_argument("--no_normalize", action="store_true")
    p.add_argument("--calibrate_response", type=str, default=None,
                   metavar="A,B",
                   help="Invert a measured linear conditioning response "
                        "achieved = A + B*request on the FIRST condition "
                        "axis for every request: the model is conditioned "
                        "on (target - A)/B so decoded properties land ON "
                        "the requested target (same contract as "
                        "generate.py --calibrate_response; fit per "
                        "checkpoint with benchmarks/"
                        "conditioning_calibrated.py). Responses carry the "
                        "transformed value as 'calibrated_request'")
    p.add_argument("--truncation", action="append", default=None,
                   metavar="SPEC",
                   help="Warm-compile a truncated-sampling config, e.g. "
                        "'top_k=6' or 'top_k=6,top_p=0.8' (repeatable). "
                        "top_k/top_p are jit-static, so only declared "
                        "configs are served")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--sync_warmup", action="store_true",
                   help="Block startup until EVERY (tier x sampler-config) "
                        "program is warm (the pre-round-5 behavior). "
                        "Default: warm the smallest tier synchronously, "
                        "serve immediately, and warm the rest of the "
                        "ladder on a background thread — requests plan "
                        "over warm tiers only until the ladder completes "
                        "(time-to-first-molecule minutes sooner on remote "
                        "backends; benchmarks/serving.json)")
    from mlx_vae_tpu.utils.compile_cache import add_cache_flags
    add_cache_flags(p)
    return p


def parse_truncation(spec: str) -> tuple:
    """Parse one --truncation SPEC ('top_k=K[,top_p=P]') -> (top_k, top_p)."""
    tk, tp = 0, 1.0
    for part in spec.split(","):
        k, _, v = part.strip().partition("=")
        try:
            if k == "top_k":
                tk = int(v)
            elif k == "top_p":
                tp = float(v)
            else:
                raise ValueError
        except ValueError:
            raise SystemExit(f"bad --truncation entry {part.strip()!r} "
                             "(expected top_k=N and/or top_p=F)") from None
    if tk < 0 or not 0.0 < tp <= 1.0 or (tk, tp) == (0, 1.0):
        raise SystemExit(f"--truncation {spec!r}: need top_k > 0 and/or "
                         "top_p in (0, 1)")
    return tk, tp


class _DispatchError(RuntimeError):
    """A job failed on the dispatcher side (device error, or close()
    draining the queue) — an HTTP 500, never a 400: the original error
    may be a ValueError/TypeError that would otherwise blame the
    client's request."""


class _ColdLadderError(RuntimeError):
    """No warm tier can serve this request's sampler config yet (background
    warm-up still running) — an HTTP 503 with Retry-After, not a 500: the
    request is valid and will succeed once the ladder is warm."""


class _Job:
    """One /generate request in flight through the dispatcher."""

    __slots__ = ("n", "greedy", "temperature", "target_norm", "key",
                 "top_k", "top_p",
                 "done", "tokens", "error", "dt", "passes", "coalesced")

    def __init__(self, n, greedy, temperature, target_norm, key,
                 top_k=0, top_p=1.0):
        self.n = n
        self.greedy = greedy
        self.temperature = temperature
        self.target_norm = target_norm
        self.key = key
        self.top_k = top_k
        self.top_p = top_p
        self.done = threading.Event()
        self.tokens = None
        self.error = None
        self.dt = 0.0
        self.passes = 0
        self.coalesced = False

    @property
    def pkey(self):
        """Program key: jobs run (and coalesce) per (greedy, top_k, top_p)
        since the sampler is a distinct compiled program for each."""
        return (self.greedy, self.top_k, self.top_p)


class GenerationService:
    """Checkpoint + a ladder of warm jitted samplers + the dispatcher."""

    def __init__(self, args):
        from mlx_vae_tpu.cli.common import resolve_property_stats
        from mlx_vae_tpu.cli.generate import infer_model_shape
        from mlx_vae_tpu.config import ModelConfig
        from mlx_vae_tpu.models.sampling import generate_with_temperature
        from mlx_vae_tpu.ops.pallas_decoder import (block_rows,
                                                    pallas_generate,
                                                    pallas_generate_supported)
        from mlx_vae_tpu.train.checkpoint import load_checkpoint

        # Cheap flag validation BEFORE the checkpoint load: a typo'd
        # ladder should exit with a message, not an int() traceback (and
        # not after seconds of npz reading).
        if args.batch_sizes:
            try:
                tiers = sorted({int(s) for s in args.batch_sizes.split(",")})
            except ValueError:
                raise SystemExit(
                    f"bad --batch_sizes {args.batch_sizes!r} (expected "
                    f"comma-separated ints, e.g. 256,2048,8192)") from None
        else:
            tiers = [args.batch_size]
        if any(t < 1 for t in tiers):
            raise SystemExit(f"batch tiers must be >= 1, got {tiers}")
        self.calib = None
        if getattr(args, "calibrate_response", None) is not None:
            try:
                ca, cb = (float(v)
                          for v in args.calibrate_response.split(","))
                if cb == 0.0:
                    raise ValueError
            except ValueError:
                raise SystemExit("--calibrate_response must be 'A,B' "
                                 "(floats, B != 0), the fitted response "
                                 "line achieved = A + B*request")
            self.calib = (ca, cb)

        ckpt = load_checkpoint(args.checkpoint)
        dec = ckpt["params"]["decoder"]
        self.shape = infer_model_shape(dec)
        self.cfg = ModelConfig(compute_dtype=args.compute_dtype,
                               use_pallas=jax.default_backend() == "tpu",
                               **self.shape)
        self.mean, self.std, self.alphabet, _ = resolve_property_stats(
            args.data, args.no_normalize, ckpt, self.cfg.num_conditions)
        self.tiers = tiers
        self.batch = tiers[-1]  # legacy /health field: the largest tier
        self.max_length = args.max_length
        self.max_molecules = args.max_molecules

        # Every sampler program the server compiles, keyed by
        # pkey = (greedy, top_k, top_p): the two plain samplers plus one
        # stochastic program per declared --truncation config (top_k/top_p
        # are jit-static, so each served config is its own warm program).
        self.trunc_cfgs = sorted({parse_truncation(s)
                                  for s in (args.truncation or [])})
        self.pkeys = ([(False, 0, 1.0), (True, 0, 1.0)]
                      + [(False, tk, tp) for tk, tp in self.trunc_cfgs])

        # Which (tier, *pkey) combos run the fused kernel vs the scan
        # sampler; the coalescing granularity follows the fused kernel's
        # grid block (per-block seeds/temps), 8 rows otherwise (TPU batch
        # alignment; greedy scan coalescing is row-independent anyway).
        self._fused = {(t,) + pk: self.cfg.use_pallas
                       and pallas_generate_supported(
                           self.cfg, t, greedy=pk[0],
                           top_k=pk[1], top_p=pk[2])
                       for t in tiers for pk in self.pkeys}
        self.chunk = (block_rows(tiers[-1])
                      if any(self._fused.values()) else 8)
        # Tiers eligible as coalesced-pass targets: block-aligned so every
        # job owns whole blocks regardless of which tier serves the group.
        self.co_tiers = [t for t in tiers if t % self.chunk == 0]
        self._can_coalesce = {}
        for pk in self.pkeys:
            if pk[0]:  # greedy: both paths row-independent
                self._can_coalesce[pk] = bool(self.co_tiers)
            else:  # stochastic: only the fused kernel's per-block streams
                self._can_coalesce[pk] = bool(self.co_tiers) and all(
                    self._fused[(t,) + pk] for t in self.co_tiers)

        def cast(toks):
            # Quarter the device->host transfer when ids fit a byte
            # (generate.py does the same); inside jit so it costs no
            # extra dispatch through the relay.
            return (toks.astype(jnp.uint8) if self.cfg.vocab_size < 256
                    else toks)

        def make(tier, pk):
            greedy, tk, tp = pk
            if self._fused[(tier,) + pk]:
                def local(z, cond, seeds, temps):
                    return cast(pallas_generate(
                        dec, self.cfg, z, cond, jax.random.PRNGKey(0),
                        max_length=self.max_length, temperature=temps,
                        greedy=greedy, top_k=tk, top_p=tp,
                        block_seeds=seeds))
            else:
                def local(z, cond, kg, temperature):
                    return cast(generate_with_temperature(
                        dec, self.cfg, z, cond, kg,
                        max_length=self.max_length,
                        temperature=temperature, greedy=greedy,
                        top_k=tk, top_p=tp))
            return jax.jit(local)

        def make_prep(tier):
            nb = -(-tier // self.chunk)

            def prep(pass_key, tn, temperature):
                kz, kg = jax.random.split(pass_key)
                z = jax.random.normal(kz, (tier, self.cfg.latent_dim),
                                      jnp.float32)
                cond = jnp.broadcast_to(tn.astype(jnp.float32),
                                        (tier, self.cfg.num_conditions))
                seeds = jax.random.randint(kg, (nb,), 0,
                                           np.iinfo(np.int32).max, jnp.int32)
                temps = jnp.full((nb,), temperature, jnp.float32)
                return z, cond, seeds, temps, kg
            return jax.jit(prep)

        self.fns = {(t,) + pk: make(t, pk)
                    for t in tiers for pk in self.pkeys}
        # Solo-path per-pass input builder (z / conditions / per-block
        # seeds+temps / scan key) as ONE program per tier: through the
        # ~55ms-RTT relay, per-pass eager prep ops would otherwise
        # dominate multi-pass bulk requests.
        self.preps = {t: make_prep(t) for t in tiers}

        # Coalesced-path canonical block streams as ONE jitted program:
        # computes every (z, seed) block a job could need (the largest
        # coalescible tier's worth; _block_streams slices the first nb).
        # The vmapped PRNG math is bitwise-identical to the per-block
        # eager fold_in/split/normal/randint it replaces, at 1 dispatch
        # instead of ~4 per block. Over-computing to the cap is free next
        # to one relay round trip (cap rows of normals is ~1MB of VPU
        # work).
        if self.co_tiers:
            cap_blocks = self.co_tiers[-1] // self.chunk

            def streams(key):
                def one(b):
                    kz, kg = jax.random.split(jax.random.fold_in(key, b))
                    return (jax.random.normal(
                                kz, (self.chunk, self.cfg.latent_dim),
                                jnp.float32),
                            jax.random.randint(kg, (), 0,
                                               np.iinfo(np.int32).max,
                                               jnp.int32))
                return jax.vmap(one)(jnp.arange(cap_blocks))
            self._streams = jax.jit(streams)

        self._pending = collections.deque()
        self._cv = threading.Condition()
        self._closed = False
        self._stats = {"device_passes": 0, "jobs": 0, "coalesced_jobs": 0}
        self._dispatcher = threading.Thread(target=self._dispatch_loop,
                                            daemon=True)
        self._dispatcher.start()

        # Warm-up. Every (tier, pkey) program must execute once before a
        # request can use it (remote backends charge 60-175s of compile +
        # first-execution stall per program). Pre-round-5 the whole
        # ladder warmed up front — 315.8s to the first molecule at the
        # serving.json config. Now only the SMALLEST tier (every sampler
        # config) warms synchronously; the rest of the ladder warms on a
        # background thread while the server handles traffic, with
        # request planning restricted to warm tiers until it finishes
        # (VERDICT r4 weak #5).
        self._warm = set()
        self._warm_done = threading.Event()
        self._warmer = None
        t0 = time.perf_counter()
        for pk in self.pkeys:
            self._warm_one(self.tiers[0], pk)
        if getattr(args, "sync_warmup", False):
            self._warm_rest()
            print(f"Warmed all {len(self.fns)} sampler programs "
                  f"(tiers {self.tiers}, --sync_warmup) in "
                  f"{time.perf_counter() - t0:.1f}s")
        else:
            self._warmer = threading.Thread(target=self._warm_rest,
                                            daemon=True)
            self._warmer.start()
            rest = len(self.fns) - len(self._warm)
            print(f"Serving after warming the {self.tiers[0]}-row tier "
                  f"({len(self._warm)} programs, "
                  f"{time.perf_counter() - t0:.1f}s); warming {rest} more "
                  f"in the background")

    def _warm_one(self, tier, pk):
        """Execute (tier, pkey) once and mark it warm."""
        job = _Job(1, pk[0], 1.0,
                   np.zeros((1, self.cfg.num_conditions), np.float32),
                   jax.random.PRNGKey(0), top_k=pk[1], top_p=pk[2])
        self._run_solo(job, forced_tier=tier, count_stats=False)
        self._warm.add((tier,) + pk)

    def _warm_rest(self):
        """Warm the remaining (tier, pkey) programs smallest-tier first,
        then the coalesced-path stream program; runs on a daemon thread
        (jit compilation is thread-safe; device execution interleaves
        with live requests at the runtime's discretion)."""
        for t in self.tiers:
            for pk in self.pkeys:
                if self._closed:
                    return
                if (t,) + pk not in self._warm:
                    self._warm_one(t, pk)
        if self.co_tiers and not self._closed:
            jax.block_until_ready(self._streams(jax.random.PRNGKey(0)))
        self._warm_done.set()

    def wait_warm(self, timeout=None) -> bool:
        """Block until the full ladder (and the coalesced stream program)
        is warm. Tests and benches that assert full-ladder pass plans or
        coalescing behavior call this after construction."""
        return self._warm_done.wait(timeout)

    # ---- planning helpers ----

    def _padded(self, n: int) -> int:
        return -(-n // self.chunk) * self.chunk

    def plan_passes(self, n: int) -> list[int]:
        """Full-ladder pass decomposition for n molecules (see
        plan_cover); the steady-state plan once warm-up completes."""
        return list(plan_cover(n, tuple(self.tiers)))

    def _plan_warm(self, job) -> list[int]:
        """Pass plan restricted to tiers already warm for this job's
        sampler config (equals plan_passes once warm-up completes)."""
        warm = tuple(t for t in self.tiers if (t,) + job.pkey in self._warm)
        if not warm:
            raise _ColdLadderError(
                f"no warm tier for sampler config greedy={job.pkey[0]} "
                f"top_k={job.pkey[1]} top_p={job.pkey[2]} yet "
                f"(background warm-up running)")
        return list(plan_cover(job.n, warm))

    # ---- dispatcher ----

    def _eligible(self, job) -> bool:
        """Can this job run on the block-canonical coalesced path? (Only
        once the full ladder incl. the stream program is warm — before
        that every job runs solo over warm tiers.)"""
        return (self._warm_done.is_set()
                and self._can_coalesce[job.pkey]
                and self._padded(job.n) <= self.co_tiers[-1])

    def close(self, timeout: float = 30.0):
        """Stop the dispatcher thread. Queued-but-unstarted jobs fail with
        an error (their clients unblock) rather than hanging; the thread is
        joined so a closed service pins no jitted programs via a live
        frame (tests build many services per process)."""
        with self._cv:
            if self._closed:
                return
            self._closed = True
            drained = list(self._pending)
            self._pending.clear()
            self._cv.notify_all()
        for j in drained:
            j.error = RuntimeError("service closed")
            j.done.set()
        if self._dispatcher is not threading.current_thread():
            self._dispatcher.join(timeout)
        if self._warmer is not None \
                and self._warmer is not threading.current_thread():
            self._warmer.join(timeout)

    def _dispatch_loop(self):
        while True:
            with self._cv:
                while not self._pending and not self._closed:
                    self._cv.wait()
                if self._closed:
                    return
                job = self._pending.popleft()
                group = [job]
                if self._eligible(job):
                    # pull every already-waiting compatible job while the
                    # group still fits the largest coalescible tier — a
                    # latency bound, not a correctness one (no artificial
                    # wait: batch what's queued, nothing more)
                    cap = self.co_tiers[-1]
                    rows = self._padded(job.n)
                    keep = collections.deque()
                    while self._pending:
                        nxt = self._pending.popleft()
                        nrows = self._padded(nxt.n)
                        if (nxt.pkey == job.pkey
                                and self._eligible(nxt)
                                and nrows <= cap - rows):
                            group.append(nxt)
                            rows += nrows
                        else:
                            keep.append(nxt)
                    self._pending.extendleft(reversed(keep))
            try:
                if self._eligible(job):
                    self._run_coalesced(group)
                else:
                    self._run_solo(job)
            except Exception as e:  # surface to every waiting client
                for j in group:
                    j.error = e
            finally:
                for j in group:
                    j.done.set()

    def _block_streams(self, job):
        """Canonical per-block (z, seed) streams for the coalesced path:
        block ``b`` of a job is a pure function of (job.key, b) — identical
        content, PRNG seed and temperature whichever device pass or batch
        offset ends up executing it. This is what makes a request's tokens
        bitwise invariant to coalescing and pass partitioning.

        All blocks come from ONE jitted program (``_streams``, compiled for
        the largest coalescible tier's block count and sliced) — per-block
        eager PRNG ops would cost ~4 dispatches per block through the
        ~55ms-RTT relay, dominating small-request latency on the serving
        hot path. The vmapped in-program computation is bitwise identical
        to per-block ``fold_in -> split -> normal/randint`` calls (counter
        -based PRF; pinned DIRECTLY against the eager sequence by
        tests/test_serve.py::test_block_streams_match_eager_prng, so a
        jax upgrade changing the vmap lowering's bits cannot silently
        alter seeded clients' molecules)."""
        nb = -(-job.n // self.chunk)
        z_all, seeds_all = self._streams(job.key)
        return z_all[:nb].reshape(nb * self.chunk, -1), seeds_all[:nb], nb

    def _plan_blocks(self, nblocks: int) -> list[int]:
        """Coalescible-tier pass plan for nblocks chunk-blocks (see
        plan_cover_blocks)."""
        return list(plan_cover_blocks(nblocks, tuple(self.co_tiers),
                                      self.chunk))

    def _run_solo(self, job, forced_tier=None, count_stats=True):
        """Serial tiered passes for one job (also the warmup driver).
        Streams for pass ``p`` derive from ``fold_in(job.key, p)`` — jobs
        on this path never coalesce, so rerun-determinism is all it needs.
        Two device dispatches per pass (prep program + sampler program)."""
        out, t0 = [], time.perf_counter()
        passes = ([forced_tier] if forced_tier is not None
                  else self._plan_warm(job))
        tn = jnp.asarray(job.target_norm, jnp.float32)
        rem = job.n
        for p, tier in enumerate(passes):
            take = min(rem, tier)
            z, cond, seeds, temps, kg = self.preps[tier](
                jax.random.fold_in(job.key, p), tn,
                jnp.float32(job.temperature))
            if self._fused[(tier,) + job.pkey]:
                toks = self.fns[(tier,) + job.pkey](z, cond, seeds, temps)
            else:
                toks = self.fns[(tier,) + job.pkey](
                    z, cond, kg, jnp.float32(job.temperature))
            if hasattr(toks, "copy_to_host_async"):
                toks.copy_to_host_async()
            out.append((toks, take))
            rem -= take
        job.tokens = np.concatenate(
            [np.asarray(t)[:k] for t, k in out])[:job.n]
        job.dt = time.perf_counter() - t0
        job.passes = len(passes)
        if count_stats:  # warm-up runs don't count as served jobs
            self._stats["device_passes"] += len(passes)
            self._stats["jobs"] += 1

    def _run_coalesced(self, group):
        """Serve every job in ``group`` (same greedy flag) through
        block-partitioned device passes: each job's canonical chunk-blocks
        are laid end to end, cut into coalescible-tier passes, and the
        outputs reassembled per job. Each job's ``dt`` is its row-share of
        the group's wall clock, so a response's mols_per_sec reflects the
        request's share of device time and the per-request rates sum to
        the true device rate across coalesced clients (previously every
        client was charged the whole group's wall clock)."""
        t0 = time.perf_counter()
        pk = group[0].pkey
        C = self.cfg.num_conditions
        zs, seed_arrs, nbs = [], [], []
        for job in group:
            z, seeds, nb = self._block_streams(job)
            zs.append(z)
            seed_arrs.append(seeds)
            nbs.append(nb)
        z_cat = zs[0] if len(zs) == 1 else jnp.concatenate(zs)
        seeds_cat = (seed_arrs[0] if len(seed_arrs) == 1
                     else jnp.concatenate(seed_arrs))
        temps_cat = np.repeat(
            np.asarray([j.temperature for j in group], np.float32), nbs)
        cond_rows = np.repeat(
            np.stack([np.asarray(j.target_norm, np.float32).reshape(-1)[:C]
                      for j in group]),
            np.asarray(nbs) * self.chunk, axis=0)

        nblocks = int(sum(nbs))
        plan = self._plan_blocks(nblocks)
        outs, boff = [], 0
        for tier in plan:
            cap = tier // self.chunk
            nsel = min(cap, nblocks - boff)
            r0, rows = boff * self.chunk, nsel * self.chunk
            pad = (cap - nsel) * self.chunk
            z = z_cat[r0:r0 + rows]
            if pad:
                z = jnp.concatenate(
                    [z, jnp.zeros((pad, self.cfg.latent_dim), jnp.float32)])
            cond = jnp.asarray(
                np.concatenate([cond_rows[r0:r0 + rows],
                                np.zeros((pad, C), np.float32)])
                if pad else cond_rows[r0:r0 + rows])
            if self._fused[(tier,) + pk]:
                seeds = seeds_cat[boff:boff + nsel]
                temps = jnp.asarray(np.concatenate(
                    [temps_cat[boff:boff + nsel],
                     np.ones(cap - nsel, np.float32)]))
                if nsel < cap:
                    seeds = jnp.concatenate(
                        [seeds, jnp.zeros(cap - nsel, jnp.int32)])
                toks = self.fns[(tier,) + pk](z, cond, seeds, temps)
            else:
                # scan path: only greedy groups land here (argmax ignores
                # temperature and draws nothing, so per-job temps are moot)
                toks = self.fns[(tier,) + pk](
                    z, cond, jax.random.PRNGKey(0),
                    jnp.float32(group[0].temperature))
            if hasattr(toks, "copy_to_host_async"):
                toks.copy_to_host_async()
            outs.append(toks[:rows])
            boff += nsel

        rows_all = np.concatenate([np.asarray(t) for t in outs])
        dt = time.perf_counter() - t0
        total_rows = nblocks * self.chunk
        off = 0
        for job, nb in zip(group, nbs):
            r = nb * self.chunk
            job.tokens = rows_all[off:off + job.n]
            off += r
            job.dt = dt * (r / total_rows)
            job.passes = len(plan)
            job.coalesced = len(group) > 1
        self._stats["device_passes"] += len(plan)
        self._stats["jobs"] += len(group)
        if len(group) > 1:
            self._stats["coalesced_jobs"] += len(group)

    # ---- request surface ----

    @staticmethod
    def _number(req: dict, field: str, default, kind):
        """Fetch a numeric request field, rejecting JSON booleans — bool is
        an int subclass, so ``{"seed": true}`` would otherwise silently
        coerce (``int(True) == 1``) instead of returning the 400 the
        validation contract promises (ADVICE r3)."""
        v = req.get(field, default)
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise ValueError(f"{field} must be a number, got {v!r}")
        if kind is int and not float(v).is_integer():
            # int(3.5) would silently truncate — e.g. serve a top_k=3
            # config the client never asked for, or make seeds 1.2 and
            # 1.7 return identical molecules.
            raise ValueError(f"{field} must be an integer, got {v!r}")
        return kind(v)

    def generate(self, req: dict) -> dict:
        from mlx_vae_tpu.cli.common import normalized_targets
        from mlx_vae_tpu.data.metrics import uniqueness
        from mlx_vae_tpu.data.prepare import decode_tokens, selfies_validity

        n = req.get("num_molecules", 100)
        # Must be an exact int (no bools, no floats): tokens[:True] would
        # silently generate 1 molecule.
        if isinstance(n, bool) or not isinstance(n, int) \
                or not 1 <= n <= self.max_molecules:
            raise ValueError(f"num_molecules must be an int in "
                             f"[1, {self.max_molecules}], got {n!r}")
        temperature = self._number(req, "temperature", 1.0, float)
        if temperature <= 0:
            raise ValueError(f"temperature must be > 0, got {temperature}")
        greedy = bool(req.get("greedy", False))
        top_k = self._number(req, "top_k", 0, int)
        top_p = self._number(req, "top_p", 1.0, float)
        if (top_k, top_p) != (0, 1.0):
            if greedy:
                raise ValueError("top_k/top_p have no effect with "
                                 "greedy=true (argmax ignores truncation)")
            if (top_k, top_p) not in set(self.trunc_cfgs):
                raise ValueError(
                    f"truncation (top_k={top_k}, top_p={top_p}) is not "
                    f"warm-compiled (jit-static in the sampler); served "
                    f"configs: {self.trunc_cfgs or 'none'} — start the "
                    f"server with --truncation 'top_k=K,top_p=P', or use "
                    f"generate.py")
        max_selfies = self._number(req, "max_selfies", 1000, int)
        if max_selfies < 0:
            # tokens[:-5] would silently drop the LAST rows instead of
            # limiting the decode count. Validated HERE, before the job
            # pays for generation.
            raise ValueError(f"max_selfies must be >= 0, got {max_selfies}")
        target = req.get("target", [90.0])
        if not isinstance(target, list) or any(
                isinstance(t, bool) or not isinstance(t, (int, float))
                for t in target):
            raise ValueError(f"target must be a list of numbers, got {target!r}")
        target = [float(t) for t in target]
        model_target = list(target)
        if self.calib is not None and model_target:
            ca, cb = self.calib
            model_target[0] = (model_target[0] - ca) / cb
        tn = normalized_targets(model_target, self.mean, self.std,
                                self.cfg.num_conditions)
        key = jax.random.PRNGKey(self._number(req, "seed", 0, int))

        job = _Job(n, greedy, temperature, tn, key,
                   top_k=top_k, top_p=top_p)
        with self._cv:
            if self._closed:
                # Shutdown is the SERVER's state, not a client fault: a
                # 500 like the sibling path (close() draining queued
                # jobs), never a 400 a well-behaved client won't retry.
                raise _DispatchError("service closed")
            self._pending.append(job)
            self._cv.notify()
        job.done.wait()
        if job.error is not None:
            if isinstance(job.error, _ColdLadderError):
                raise job.error  # handler maps to 503 + Retry-After
            raise _DispatchError(
                f"{type(job.error).__name__}: {job.error}") from job.error
        tokens = job.tokens

        out = {
            "num_molecules": int(n),
            "target": target,
            **({"calibrated_request": round(model_target[0], 2)}
               if self.calib is not None and model_target else {}),
            "temperature": temperature,
            "greedy": greedy,
            "top_k": top_k,
            "top_p": top_p,
            "mols_per_sec": n / max(job.dt, 1e-9),
            "passes": job.passes,
            "coalesced": job.coalesced,
            "validity": selfies_validity(tokens, self.alphabet or []),
            "uniqueness": uniqueness(tokens),
        }
        if self.alphabet:
            out["selfies"] = [decode_tokens(t, self.alphabet)
                              for t in tokens[:max_selfies]]
        if req.get("return_tokens"):
            out["tokens"] = tokens.tolist()
        return out

    def health(self) -> dict:
        return {"status": "ok", "model": self.shape,
                "warmup": {
                    "complete": self._warm_done.is_set(),
                    "warm_programs": len(self._warm),
                    "total_programs": len(self.fns),
                    "warm_tiers": {
                        f"greedy={pk[0]},top_k={pk[1]},top_p={pk[2]}":
                        [t for t in self.tiers if (t,) + pk in self._warm]
                        for pk in self.pkeys}},
                "batch_size": self.batch, "batch_tiers": self.tiers,
                "calibrate_response": list(self.calib) if self.calib
                else None,
                "truncation_configs": [list(c) for c in self.trunc_cfgs],
                "coalescing": {
                    "stochastic": self._can_coalesce[(False, 0, 1.0)],
                    "greedy": self._can_coalesce[(True, 0, 1.0)],
                    "truncated": {f"top_k={tk},top_p={tp}":
                                  self._can_coalesce[(False, tk, tp)]
                                  for tk, tp in self.trunc_cfgs},
                    "block_rows": self.chunk},
                "stats": dict(self._stats),
                "max_length": self.max_length,
                "backend": jax.default_backend(),
                "alphabet_size": len(self.alphabet or [])}


def make_handler(service: GenerationService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict, headers: dict = None):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, service.health())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(req, dict):
                    raise ValueError("request body must be a JSON object")
                payload = service.generate(req)
            except _ColdLadderError as e:
                # Background warm-up hasn't reached any tier this request
                # can use: a 503 the client should retry, with an explicit
                # Retry-After — not a 500 (nothing failed) and not a 400
                # (the request is valid).
                self._send(503, {"error": str(e), "retry_after": 60},
                           headers={"Retry-After": "60"})
                return
            except _DispatchError as e:
                # Dispatcher-side failures (a device error surfaced via
                # job.error, or close() draining queued jobs at shutdown)
                # are the SERVER's fault — a JSON 500, never a bare
                # connection reset from a dead handler thread, and never a
                # 400 even when the underlying error is a ValueError.
                self._send(500, {"error": str(e)})
                return
            except (ValueError, TypeError, KeyError, json.JSONDecodeError,
                    SystemExit) as e:
                # TypeError covers wrong JSON field types (e.g. a scalar
                # where a list is required, or null seed) — without it the
                # handler thread dies and the client sees a connection
                # reset instead of the JSON 400 contract.
                self._send(400, {"error": str(e)})
                return
            # The 200 write sits OUTSIDE the try: a send failure (slow
            # client, socket timeout) must propagate to http.server's
            # connection teardown, not trigger a second response onto a
            # half-written stream.
            self._send(200, payload)

        def log_message(self, fmt, *fmt_args):  # quiet per-request stderr
            pass

    return Handler


def serve_forever(args, ready_event=None):
    """Build the service, bind, and serve. ``ready_event`` (tests) is set
    once the socket is bound and samplers are warm; the bound server is
    stashed on the event for shutdown."""
    service = GenerationService(args)
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(service))
    if ready_event is not None:
        ready_event.server = server
        ready_event.service = service
        ready_event.set()
    print(f"Serving on http://{server.server_address[0]}:"
          f"{server.server_address[1]} (POST /generate, GET /health)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        service.close()


def main(argv=None):
    from mlx_vae_tpu.utils.compile_cache import setup_cache_from_args
    args = build_parser().parse_args(argv)
    setup_cache_from_args(args)
    serve_forever(args)


if __name__ == "__main__":
    main()
