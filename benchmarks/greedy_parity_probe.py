#!/usr/bin/env python3
"""Greedy fused-generation parity probe (VERDICT r2 item 5).

Measures the agreement between the fused kernel (`ops/pallas_decoder.py`)
and the scan sampler (`models/sampling.py`) under greedy (argmax) sampling,
at corners spanning the gate's admitted envelope in both dtypes. The two
programs sum the same dot products in different orders, so ~1-ulp logit
differences flip argmax on near-ties and the token feedback loop amplifies
one flip into a different suffix; whether a given corner happens to agree
bit-for-bit depends on whether XLA's reduction order for the scan path
matches the kernel's — the committed JSON shows it held at some f32
corners and at no bf16 corner, so the gate's contract is DISTRIBUTIONAL
(>= 99% first-token agreement), not bitwise.

This probe measures that story instead of asserting it, and tries to
eliminate the flips: the kernel's `_ACC_CHUNK` hook forces an explicit
sequential K-chunk accumulation order in every in-kernel dot. For each
candidate order it reports, against the scan sampler on identical
params/inputs:

* first-token agreement (pure logit numerics — no feedback yet),
* full-row agreement and mean first-divergence step,
* the scan path's top-2 logit margin distribution at step 0 (how much
  near-tie mass there is for ulp noise to flip).

Run on TPU: ``python benchmarks/greedy_parity_probe.py``.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def probe_config(hidden, layers, dtype, B, L, chunks):
    from mlx_vae_tpu.config import ModelConfig
    from mlx_vae_tpu.models import ARCVAE
    from mlx_vae_tpu.models.decoder import initialize_hidden_state, _stacked_cell
    from mlx_vae_tpu.models.layers import embedding, linear
    from mlx_vae_tpu.models.sampling import generate_with_temperature
    from mlx_vae_tpu.ops import pallas_decoder

    mcfg = ModelConfig(hidden_dim=hidden, num_layers=layers,
                       compute_dtype=dtype, use_pallas=True)
    vae = ARCVAE(mcfg, jax.random.PRNGKey(0))
    dec = vae.params["decoder"]
    kz = jax.random.PRNGKey(1)
    z = jax.random.normal(kz, (B, mcfg.latent_dim), jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(2), (B, mcfg.num_conditions),
                             jnp.float32)
    key = jax.random.PRNGKey(3)

    ref = np.asarray(generate_with_temperature(
        dec, mcfg, z, cond, key, max_length=L, temperature=1.0, greedy=True))

    # scan-path step-0 logit margins (how tie-prone this model is)
    h0, c0 = initialize_hidden_state(dec, mcfg, z, cond)
    tok0 = jnp.full((B,), mcfg.start_token, jnp.int32)
    emb = embedding(dec["embedding"], tok0, mcfg.dtype)
    x = jnp.concatenate([emb.astype(jnp.float32), cond], axis=1)
    out, _, _ = _stacked_cell(dec, mcfg, x, h0, c0)
    logits0 = np.asarray(linear(dec["fc_out"], out, mcfg.dtype),
                         np.float32)
    srt = np.sort(logits0, axis=1)
    margins = srt[:, -1] - srt[:, -2]

    results = {
        "config": f"H={hidden}/{layers}L {dtype} B={B} L={L}",
        "step0_top2_margin": {
            "min": float(margins.min()), "p1": float(np.percentile(margins, 1)),
            "median": float(np.median(margins)),
            "frac_below_1e-3": float((margins < 1e-3).mean()),
            "frac_below_1e-5": float((margins < 1e-5).mean()),
        },
        "chunks": {},
    }

    for chunk in chunks:
        pallas_decoder._ACC_CHUNK = chunk
        jax.clear_caches()  # the hook is read at trace time
        try:
            got = np.asarray(pallas_decoder.pallas_generate(
                dec, mcfg, z, cond, key, max_length=L, temperature=1.0,
                greedy=True))
        except Exception as e:  # a chunk order may not compile
            results["chunks"][str(chunk)] = {"error": repr(e)[:200]}
            print(f"  chunk={chunk}: ERROR {e!r}", flush=True)
            continue
        finally:
            pallas_decoder._ACC_CHUNK = None
        first_tok = float((got[:, 0] == ref[:, 0]).mean())
        row_ok = (got == ref).all(axis=1)
        diverge = np.argmax(got != ref, axis=1)[~row_ok]
        results["chunks"][str(chunk)] = {
            "first_token_agreement": first_tok,
            "full_row_agreement": float(row_ok.mean()),
            "mean_first_divergence_step": (float(diverge.mean())
                                           if diverge.size else None),
        }
        print(f"  chunk={chunk}: first-token {100 * first_tok:.2f}%  "
              f"full-row {100 * float(row_ok.mean()):.2f}%  "
              f"first-div-step "
              f"{float(diverge.mean()) if diverge.size else float('nan'):.1f}",
              flush=True)
    jax.clear_caches()
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--max_length", type=int, default=64)
    ap.add_argument("--output", default="benchmarks/greedy_parity_probe.json")
    args = ap.parse_args()

    out = []
    # Control: a measured-bit-parity shape — the probe must report 100%
    # here (any regression below 100% on this row means the kernel or the
    # scan path changed, not just reduction-order noise).
    print("control H=256/2L float32:", flush=True)
    out.append(probe_config(256, 2, "float32", args.batch, args.max_length,
                            [None]))
    # Corners spanning the fused-greedy envelope (n*H<=2048 for H<=512,
    # from its smallest admitted H to its largest n*H) in both dtypes —
    # the gate's distributional claim is measured at every row, not
    # assumed (code-review r3). Bit parity is a per-corner accident with
    # no dtype-free H-threshold story: it held at f32 H=128/8L, H=256/2L,
    # H=256/8L and H=512/2L but NOT at f32 H=384/3L or H=512/4L, and at
    # no bf16 corner (the bf16 H=128/H=256 rows already disagree on some
    # rows).
    for h, n, dt in ((128, 8, "float32"), (128, 8, "bfloat16"),
                     (256, 2, "bfloat16"), (256, 8, "bfloat16"),
                     (384, 3, "float32"), (384, 3, "bfloat16"),
                     (512, 2, "float32"), (512, 2, "bfloat16"),
                     (512, 4, "float32"), (512, 4, "bfloat16"),
                     (256, 8, "float32")):
        print(f"envelope-corner H={h}/{n}L {dt}:", flush=True)
        out.append(probe_config(h, n, dt, args.batch, args.max_length,
                                [None]))
    # The scaled config, all candidate accumulation orders.
    print("scaled H=1024/4L bfloat16:", flush=True)
    out.append(probe_config(1024, 4, "bfloat16", args.batch, args.max_length,
                            [None, 512, 256, 128]))
    Path(args.output).write_text(json.dumps(out, indent=2))
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
