#!/usr/bin/env python3
"""Bulk conditional generation CLI.

The reference exposes generation only as ``ARCVAE.generate`` (no CLI). This
implements BASELINE.json config 5: bulk TPSA-targeted generation (up to 1M
molecules) via the jitted batched sampler, chunked to a device-friendly batch,
with SELFIES decoding and validity reporting.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="Generate molecules from a trained AR-CVAE")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Path to a .npz checkpoint (e.g. checkpoints/checkpoint_best.npz)")
    p.add_argument("--data", type=str, default=None,
                   help="Dataset JSON (for property normalization stats + alphabet)")
    p.add_argument("--num_molecules", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=4096)
    p.add_argument("--max_length", type=int, default=80)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--greedy", action="store_true",
                   help="Argmax decoding (the reference's behavior)")
    p.add_argument("--top_k", type=int, default=0,
                   help="Sample only among the k most likely tokens per "
                        "step (0 = disabled). Extension beyond the "
                        "reference's temperature-only surface; runs "
                        "in-kernel on fused-sampler shapes")
    p.add_argument("--top_p", type=float, default=1.0,
                   help="Nucleus sampling: restrict each step to the "
                        "smallest token set with cumulative probability "
                        ">= top_p (1.0 = disabled); runs in-kernel on "
                        "fused-sampler shapes")
    p.add_argument("--target", type=float, nargs="+", default=[90.0],
                   help="Target property value(s), raw units (e.g. TPSA 90)")
    p.add_argument("--output", type=str, default="generated.json",
                   help="Output path. A .npz suffix stores the token matrix "
                        "as a compressed array (recommended at bulk scale: "
                        "1M molecules is ~300MB of JSON but ~10MB of npz, "
                        "and skips the minutes-long tolist/dump); anything "
                        "else writes the JSON document.")
    p.add_argument("--no_normalize", action="store_true",
                   help="Pass --target values to the model raw, without "
                        "z-scoring by the train-set stats (only correct if "
                        "the model was trained on unnormalized properties)")
    p.add_argument("--calibrate_response", type=str, default=None,
                   metavar="A,B",
                   help="Invert a measured linear conditioning response "
                        "achieved = A + B*request on the FIRST condition "
                        "axis: the value sent to the model becomes "
                        "(target - A)/B, so decoded properties land ON the "
                        "requested target instead of the model's shrunken "
                        "response (~0.65x, invariant to training levers — "
                        "docs/DESIGN.md 'Round-5 lever sweep'). Fit A,B per "
                        "checkpoint with benchmarks/"
                        "conditioning_calibrated.py; measured there: slope "
                        "0.62 -> 0.86, decoded-TPSA MAE 21.7 -> 18.4 at no "
                        "uniqueness cost. Example: --calibrate_response "
                        "2.38,0.638")
    p.add_argument("--data_parallel", action="store_true",
                   help="Shard each generation batch over all visible "
                        "devices (shard_map over a ('data',) mesh)")
    # Model shape flags. Default: inferred from the checkpoint's parameter
    # shapes; pass explicitly only to assert a shape (mismatch = hard error).
    p.add_argument("--vocab_size", type=int, default=None)
    p.add_argument("--embedding_dim", type=int, default=None)
    p.add_argument("--hidden_dim", type=int, default=None)
    p.add_argument("--latent_dim", type=int, default=None)
    p.add_argument("--num_conditions", type=int, default=None)
    p.add_argument("--num_layers", type=int, default=None)
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    from mlx_vae_tpu.utils.compile_cache import add_cache_flags
    add_cache_flags(p)
    return p


def infer_model_shape(dec_params: dict) -> dict:
    """Model dims from decoder parameter shapes (the checkpoint is the
    source of truth; MLX-style key layout, see ``train/checkpoint.py``)."""
    V, E = dec_params["embedding"]["weight"].shape
    H = dec_params["fc_out"]["weight"].shape[1]
    latent = dec_params["z_to_hidden"]["weight"].shape[1]
    C = dec_params["condition_to_hidden"]["weight"].shape[1]
    n = sum(1 for k in dec_params if k.startswith("lstm_layer_"))
    return {"vocab_size": V, "embedding_dim": E, "hidden_dim": H,
            "latent_dim": latent, "num_conditions": C, "num_layers": n}


def make_generate_fn(mcfg, dec_params, use_fused, max_length, temperature,
                     greedy, mesh=None, top_k=0, top_p=1.0):
    """Batch generator ``(z, cond, key) -> tokens [B, L]``.

    With a mesh, the batch axis is sharded over ``('data',)`` via
    ``jax.shard_map`` — each device samples its z-shard locally (the fused
    Pallas kernel runs per-shard unchanged), no collectives needed; greedy
    output is bit-identical to the single-device path.
    """
    from mlx_vae_tpu.models.sampling import generate_with_temperature
    from mlx_vae_tpu.ops.pallas_decoder import pallas_generate

    def local(z, cond, kg):
        if use_fused:
            return pallas_generate(dec_params, mcfg, z, cond, kg,
                                   max_length=max_length,
                                   temperature=temperature, greedy=greedy,
                                   top_k=top_k, top_p=top_p)
        return generate_with_temperature(dec_params, mcfg, z, cond, kg,
                                         max_length=max_length,
                                         temperature=temperature,
                                         greedy=greedy,
                                         top_k=top_k, top_p=top_p)

    if mesh is None:
        return jax.jit(local)

    from jax.sharding import PartitionSpec as P

    def local_shard(z, cond, kg):
        # distinct per-shard noise for the stochastic path
        kg = jax.random.fold_in(kg, jax.lax.axis_index("data"))
        return local(z, cond, kg)

    shmap = jax.shard_map(local_shard, mesh=mesh,
                          in_specs=(P("data"), P("data"), P()),
                          out_specs=P("data"), check_vma=False)
    return jax.jit(shmap)


def main(argv=None):
    from mlx_vae_tpu.config import ModelConfig
    from mlx_vae_tpu.data.prepare import selfies_validity, decode_tokens
    from mlx_vae_tpu.train.checkpoint import load_checkpoint

    parser = build_parser()
    args = parser.parse_args(argv)
    from mlx_vae_tpu.utils.compile_cache import setup_cache_from_args
    setup_cache_from_args(args)
    if args.top_k < 0:
        parser.error(f"--top_k must be >= 0 (0 disables), got {args.top_k}")
    if not 0.0 < args.top_p <= 1.0:
        parser.error(f"--top_p must be in (0, 1] (1.0 disables), got {args.top_p}")
    calib = None
    if args.calibrate_response is not None:
        try:
            ca, cb = (float(v) for v in args.calibrate_response.split(","))
            if cb == 0.0:
                raise ValueError
            calib = (ca, cb)
        except ValueError:
            parser.error("--calibrate_response must be 'A,B' (floats, "
                         "B != 0), the fitted response line "
                         "achieved = A + B*request")

    ckpt = load_checkpoint(args.checkpoint)
    dec_params = ckpt["params"]["decoder"]

    shape = infer_model_shape(dec_params)
    for name, inferred in shape.items():
        given = getattr(args, name)
        if given is not None and given != inferred:
            raise SystemExit(
                f"ERROR: --{name} {given} contradicts the checkpoint "
                f"(parameter shapes imply {name}={inferred})")
    mcfg = ModelConfig(compute_dtype=args.compute_dtype, **shape)

    # Normalize the raw target properties with the train-set stats. The model
    # was trained on z-scored conditions, so feeding raw targets (e.g. TPSA
    # 90) silently mis-conditions generation — see ``cli/common.py``.
    from mlx_vae_tpu.cli.common import normalized_targets, resolve_property_stats
    mean, std, alphabet, train_ds = resolve_property_stats(
        args.data, args.no_normalize, ckpt, mcfg.num_conditions)
    model_target = list(args.target)
    if calib is not None:
        ca, cb = calib
        model_target[0] = (model_target[0] - ca) / cb
        print(f"Calibrated conditioning: target {args.target[0]:g} -> "
              f"model request {model_target[0]:.1f} "
              f"(inverting achieved = {ca:g} + {cb:g}*request)")
    target = normalized_targets(model_target, mean, std,
                                mcfg.num_conditions)

    key = jax.random.PRNGKey(0)
    cond = jnp.broadcast_to(jnp.asarray(target),
                            (args.batch_size, mcfg.num_conditions))

    small_vocab = mcfg.vocab_size < 256

    mesh = None
    if args.data_parallel and len(jax.devices()) > 1:
        from mlx_vae_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
        nd = mesh.shape["data"]
        if args.batch_size % nd != 0:
            raise SystemExit(f"--batch_size {args.batch_size} must divide "
                             f"over {nd} data-parallel devices")
        print(f"Data-parallel generation over {nd} devices")

    from mlx_vae_tpu.ops.pallas_decoder import pallas_generate_supported
    local_batch = args.batch_size // (mesh.shape["data"] if mesh else 1)
    use_fused = pallas_generate_supported(mcfg, local_batch,
                                          greedy=args.greedy,
                                          top_k=args.top_k, top_p=args.top_p)
    if use_fused:
        print("Using fused Pallas generation kernel")

    gen_shard = make_generate_fn(mcfg, dec_params, use_fused,
                                 args.max_length, args.temperature,
                                 args.greedy, mesh=mesh,
                                 top_k=args.top_k, top_p=args.top_p)

    def one_batch(key):
        kz, kg = jax.random.split(key)
        # z drawn globally (sharded afterwards) so data-parallel greedy
        # output is bit-identical to single-device.
        z = jax.random.normal(kz, (args.batch_size, mcfg.latent_dim), jnp.float32)
        c = cond
        if mesh is not None:
            from mlx_vae_tpu.parallel.mesh import batch_sharding
            z = jax.device_put(z, batch_sharding(mesh))
            c = jax.device_put(cond, batch_sharding(mesh))
        toks = gen_shard(z, c, kg)
        # Quarter the device->host transfer when token ids fit in a byte.
        return toks.astype(jnp.uint8) if small_vocab else toks

    # Warmup/compile on one batch, then dispatch ALL batches asynchronously
    # and read back afterwards — per-batch blocking readbacks would pay one
    # host round trip each.
    key, kw = jax.random.split(key)
    np.asarray(one_batch(kw))

    n_batches = -(-args.num_molecules // args.batch_size)
    t0 = time.perf_counter()
    device_toks = []
    for _ in range(n_batches):
        key, k = jax.random.split(key)
        toks = one_batch(k)
        if hasattr(toks, "copy_to_host_async"):
            toks.copy_to_host_async()
        device_toks.append(toks)
    tokens = np.concatenate([np.asarray(t) for t in device_toks])
    dt = time.perf_counter() - t0
    tokens = tokens[: args.num_molecules]
    rate = len(tokens) / dt
    validity = selfies_validity(tokens, alphabet or [])
    print(f"Generated {len(tokens):,} molecules in {dt:.2f}s "
          f"({rate:,.0f} mols/sec, compile excluded)")
    print(f"Validity: {100 * validity:.1f}%")

    # Sample-quality metrics (MOSES conventions; see data/metrics.py).
    # Novelty needs the training token matrix, so it reports only with --data.
    from mlx_vae_tpu.data.metrics import molecule_metrics, novelty, uniqueness
    uniq = uniqueness(tokens)
    print(f"Uniqueness: {100 * uniq:.1f}%")
    nov = None
    if train_ds is not None:
        nov = novelty(tokens, train_ds.molecules)
        print(f"Novelty vs training set: {100 * nov:.1f}%")

    meta = {
        "mols_per_sec": rate,
        "validity": validity,
        "uniqueness": uniq,
        "temperature": args.temperature,
        "target": args.target,
    }
    if nov is not None:
        meta["novelty"] = nov

    # Molecule-level metrics when a chemistry alphabet is present:
    # canonical-SMILES uniqueness and decoded Ertl-TPSA fidelity against
    # the first conditioning target (the reference's TPSA convention).
    mm = molecule_metrics(tokens, alphabet or [],
                          target_tpsa=args.target[0])
    if mm is not None:
        from mlx_vae_tpu.data.prepare import chemistry_backend
        meta["molecule_metrics"] = mm
        meta["chemistry_backend"] = chemistry_backend()
        print(f"Molecule-level (sample {mm['sampled']:,}, "
              f"{chemistry_backend()} backend): "
              f"unique {100 * mm['mol_uniqueness']:.1f}%"
              + (f", TPSA {mm['tpsa_mean']:.1f}±{mm['tpsa_std']:.1f} "
                 f"(target {mm['tpsa_target']:.0f}, "
                 f"MAE {mm['tpsa_mae']:.1f})" if "tpsa_mae" in mm else ""))
    if args.top_k or args.top_p < 1.0:
        meta["top_k"], meta["top_p"] = args.top_k, args.top_p
    selfies = ([decode_tokens(t, alphabet) for t in tokens[:1000]]
               if alphabet else None)
    if args.output.endswith(".npz"):
        # Bulk contract: the token matrix stays an array (uint8 for small
        # vocabs — the same dtype that crossed the link), scalars ride
        # along as 0-d arrays, and only the 1000-row SELFIES sample is
        # decoded. No tolist() of a million rows.
        arrays = dict(tokens=tokens, **meta)
        if selfies is not None:
            arrays["selfies_sample"] = np.asarray(selfies)
        np.savez_compressed(args.output, **arrays)
    else:
        out = {"tokens": tokens.tolist(), **meta}
        if selfies is not None:
            out["selfies"] = selfies
        with open(args.output, "w") as f:
            json.dump(out, f)
    print(f"Saved {args.output}")


if __name__ == "__main__":
    main()
