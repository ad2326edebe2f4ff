#!/usr/bin/env python3
"""Encode a dataset split to latent space + reconstruction evaluation.

The reference has no encode path at all — its encoder is reachable only
inside the training loss (``/root/reference/complete_vae_loss.py:38``), so a
user cannot extract molecule embeddings or measure reconstruction fidelity
from a trained checkpoint. This CLI provides both:

* **Embeddings**: ``(mu, logvar)`` for every molecule of a split, written to
  one ``.npz`` alongside the raw/normalized properties — the input for
  downstream property models, nearest-neighbor search, or the
  ``interpolate.py`` endpoints.
* **Reconstruction eval**, two views (``models/latent_eval.py``):
  teacher-forced **next-token accuracy** (argmax of the TF=1 decode — the
  prediction problem the training CE optimizes, so it tracks learning
  directly), and free-running **generative reconstruction** (greedy decode
  from ``z = mu``, scored as pad-masked token accuracy + exact
  canonical-molecule match — strictly harder: one early divergence derails
  the rest of the row, so small models score near chance here while their
  next-token accuracy is high; compare the reference's own train/val "true
  loss" gap discussion, ``/root/reference/README.md:149-151``).
* **Latent health**: per-dim KL, active units (Burda et al.), and the
  reference's monitor-variant MI estimator over the whole split.

TPU shape: encoding and decoding run as fixed-shape jitted batches (last
batch padded, outputs trimmed) — one compile each, MXU-friendly, no
per-molecule dispatch.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(
        description="Encode molecules to latent space and evaluate "
                    "reconstruction fidelity")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Path to a .npz checkpoint")
    p.add_argument("--data", type=str, required=True,
                   help="Dataset JSON (the molecules to encode)")
    p.add_argument("--split", choices=["train", "val", "test", "all"],
                   default="test",
                   help="Which seed-67 split to encode (default: test)")
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--no_reconstruct", action="store_true",
                   help="Skip the greedy reconstruction decode (embeddings "
                        "and latent stats only)")
    p.add_argument("--au_threshold", type=float, default=0.01,
                   help="Active-unit threshold on Var_x(mu_d)")
    p.add_argument("--output", type=str, default="latents.npz",
                   help="Embeddings output (.npz)")
    p.add_argument("--report", type=str, default="encode_report.json",
                   help="Metrics report output (JSON)")
    p.add_argument("--data_parallel", action="store_true",
                   help="Shard each batch over all visible devices "
                        "(shard_map over a ('data',) mesh); results are "
                        "bit-identical to single-device — encoding and the "
                        "deterministic decodes need no collectives")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    from mlx_vae_tpu.utils.compile_cache import add_cache_flags
    add_cache_flags(p)
    return p


def _batched(fn, arrays, batch_size: int):
    """Apply a jitted fixed-shape ``fn(*batch_arrays)`` over N rows; the last
    batch is padded by repeating row 0 and trimmed after. Returns stacked
    numpy outputs (tuple if fn returns a tuple)."""
    n = arrays[0].shape[0]
    outs = []
    for s in range(0, n, batch_size):
        chunk = [a[s:s + batch_size] for a in arrays]
        pad = batch_size - chunk[0].shape[0]
        if pad:
            chunk = [np.concatenate([c, np.repeat(c[:1], pad, axis=0)])
                     for c in chunk]
        out = fn(*[jnp.asarray(c) for c in chunk])
        out = out if isinstance(out, tuple) else (out,)
        outs.append([np.asarray(o)[: batch_size - pad or None] for o in out])
    cols = [np.concatenate(col) for col in zip(*outs)]
    return tuple(cols) if len(cols) > 1 else cols[0]


def main(argv=None):
    from mlx_vae_tpu.cli.generate import infer_model_shape, make_generate_fn
    from mlx_vae_tpu.config import ModelConfig
    from mlx_vae_tpu.data.split import load_and_split
    from mlx_vae_tpu.models.encoder import encoder_apply
    from mlx_vae_tpu.models.latent_eval import (latent_statistics,
                                                reconstruction_metrics)
    from mlx_vae_tpu.ops.pallas_decoder import pallas_generate_supported
    from mlx_vae_tpu.train.checkpoint import load_checkpoint

    args = build_parser().parse_args(argv)
    from mlx_vae_tpu.utils.compile_cache import setup_cache_from_args
    setup_cache_from_args(args)

    mesh = None
    if args.data_parallel and len(jax.devices()) > 1:
        from mlx_vae_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
        nd = mesh.shape["data"]
        if args.batch_size % nd != 0:
            raise SystemExit(f"--batch_size {args.batch_size} must divide "
                             f"over {nd} data-parallel devices")
        print(f"Data-parallel encoding over {nd} devices")

    def maybe_shard(fn, n_in):
        """Batch-shard a deterministic ``fn(*arrays)`` over the mesh."""
        if mesh is None:
            return jax.jit(fn)
        from jax.sharding import PartitionSpec as P
        return jax.jit(jax.shard_map(fn, mesh=mesh,
                                     in_specs=(P("data"),) * n_in,
                                     out_specs=P("data"), check_vma=False))

    ckpt = load_checkpoint(args.checkpoint)
    params = ckpt["params"]
    mcfg = ModelConfig(compute_dtype=args.compute_dtype,
                       use_pallas=jax.default_backend() == "tpu",
                       **infer_model_shape(params["decoder"]))

    train_ds, val_ds, test_ds, _ = load_and_split(
        args.data,
        property_keys=tuple(["tpsa", "logp", "mw"][:mcfg.num_conditions]))
    splits = {"train": [train_ds], "val": [val_ds], "test": [test_ds],
              "all": [train_ds, val_ds, test_ds]}[args.split]
    tokens = np.concatenate([d.molecules for d in splits])
    cond = np.concatenate([d.properties_normalized for d in splits])
    props = np.concatenate([d.properties for d in splits])
    n, L = tokens.shape
    print(f"Encoding {n:,} molecules ({args.split} split, max_length {L})")

    enc = maybe_shard(lambda x, c: encoder_apply(params["encoder"], mcfg,
                                                 x, c), 2)
    t0 = time.perf_counter()
    mu, logvar = _batched(enc, [tokens, cond], args.batch_size)
    dt = time.perf_counter() - t0
    print(f"Encoded in {dt:.2f}s ({n / dt:,.0f} mols/sec, compile included)")

    stats = latent_statistics(mu, logvar, au_threshold=args.au_threshold)
    print(f"Latent: KL {stats['kl_total']:.3f} nats | active units "
          f"{stats['active_units']}/{mcfg.latent_dim} "
          f"({100 * stats['active_fraction']:.0f}%) | MI "
          f"{stats['mutual_information']:.3f}")

    report = {
        "split": args.split,
        "num_molecules": int(n),
        "kl_total": stats["kl_total"],
        "kl_per_dim": stats["kl_per_dim"].tolist(),
        "active_units": stats["active_units"],
        "active_fraction": stats["active_fraction"],
        "au_threshold": stats["au_threshold"],
        "mutual_information": stats["mutual_information"],
    }

    if not args.no_reconstruct:
        from mlx_vae_tpu.models.decoder import decoder_apply

        key = jax.random.PRNGKey(0)  # TF=1 / greedy are deterministic; fixed key

        # Teacher-forced next-token accuracy: the training objective's view.
        tf_dec = maybe_shard(lambda z, c, x: jnp.argmax(
            decoder_apply(params["decoder"], mcfg, z, c, target_seq=x,
                          teacher_forcing_ratio=1.0, key=key), axis=-1), 3)
        tf_pred = _batched(tf_dec, [mu, cond, tokens], args.batch_size)
        mask = tokens != mcfg.pad_token
        next_tok = float((tf_pred == tokens)[mask].sum() / max(1, mask.sum()))

        # Free-running generative reconstruction: greedy decode from z = mu.
        local_batch = args.batch_size // (mesh.shape["data"] if mesh else 1)
        use_fused = pallas_generate_supported(mcfg, local_batch, greedy=True)
        if use_fused:
            print("Using fused Pallas generation kernel")
        gen = make_generate_fn(mcfg, params["decoder"], use_fused, L,
                               1.0, greedy=True, mesh=mesh)
        t0 = time.perf_counter()
        decoded = _batched(lambda z, c: gen(z, c, key), [mu, cond],
                           args.batch_size)
        dt = time.perf_counter() - t0
        rec = reconstruction_metrics(decoded, tokens,
                                     pad_token=mcfg.pad_token)
        print(f"Reconstruction: next-token accuracy (TF=1) "
              f"{100 * next_tok:.1f}% | free-running greedy from z=mu "
              f"({dt:.2f}s): token accuracy "
              f"{100 * rec['token_accuracy']:.1f}%, exact molecule match "
              f"{100 * rec['exact_match']:.1f}%")
        report["next_token_accuracy"] = next_tok
        report.update(rec)

    np.savez(args.output, mu=mu, logvar=logvar, properties=props,
             properties_normalized=cond, split=args.split)
    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)
    print(f"Saved embeddings to {args.output}, report to {args.report}")


if __name__ == "__main__":
    main()
