#!/usr/bin/env python3
"""Training CLI.

Public-surface parity with ``/root/reference/train.py``: the same 23 flags
with the same names and defaults (``train.py:21-54``), the fixed seed-67
80/10/10 split, train-stats normalization propagated to val/test, checkpoint
clearing on fresh runs / ``--resume`` from ``checkpoint_best.npz``, per-epoch
history accumulation, best-val checkpointing, and the final history plot.

TPU extensions (new flags, all defaulted off/off-path):
``--properties`` (multi-property conditioning), ``--use_property_predictor``
(the reference's TODO head, with corrected loss wiring), ``--data_parallel``,
``--compute_dtype``, ``--use_pallas``, ``--reference_zero_state``,
``--synthetic`` (generate a synthetic dataset when the ChEMBL blob is
unavailable — it is shipped by neither repo).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import jax


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Train AR-CVAE for molecular generation")

    # Data arguments (reference train.py:21-22)
    parser.add_argument("--data", type=str, default="mlx_data/chembl_cns_selfies.json",
                        help="Path to dataset JSON file")

    # Model arguments (reference train.py:25-31)
    parser.add_argument("--vocab_size", type=int, default=80, help="Vocabulary size")
    parser.add_argument("--embedding_dim", type=int, default=128, help="Embedding dimension")
    parser.add_argument("--hidden_dim", type=int, default=256, help="Hidden dimension")
    parser.add_argument("--latent_dim", type=int, default=128, help="Latent dimension")
    parser.add_argument("--num_conditions", type=int, default=1, help="Number of conditions")
    parser.add_argument("--num_layers", type=int, default=2, help="Number of LSTM layers")
    parser.add_argument("--dropout", type=float, default=0.2, help="Dropout rate")

    # Training arguments (reference train.py:34-44)
    parser.add_argument("--epochs", type=int, default=30, help="Number of epochs")
    parser.add_argument("--batch_size", type=int, default=32, help="Batch size")
    parser.add_argument("--learning_rate", type=float, default=2e-4, help="Learning rate")
    parser.add_argument("--beta_start", type=float, default=0.0, help="Initial beta value")
    parser.add_argument("--beta_end", type=float, default=0.05, help="Final beta value")
    parser.add_argument("--beta_warmup_epochs", type=int, default=20, help="Beta warmup epochs")
    parser.add_argument("--lambda_prop", type=float, default=0.1, help="Property loss weight")
    parser.add_argument("--lambda_collapse", type=float, default=0.001,
                        help="Posterior collapse weight")
    parser.add_argument("--free_bits", type=float, default=1.0,
                        help="Free bits constraint (min KL per dimension)")
    parser.add_argument("--lambda_mi", type=float, default=0.01,
                        help="Mutual information penalty weight")
    parser.add_argument("--target_mi", type=float, default=4.85,
                        help="MI target driving the MI penalty "
                             "lambda_mi*max(0, target_mi - MI). The reference "
                             "hard-codes 4.85 (trainer.py:152, "
                             "complete_vae_loss.py:19); exposed as a flag for "
                             "latent-health tuning (it is the lever the MI "
                             "penalty pushes toward)")
    parser.add_argument("--grad_clip", type=float, default=1.0, help="Gradient clipping norm")

    # Output arguments (reference train.py:47-54)
    parser.add_argument("--checkpoint_dir", type=str, default="./checkpoints",
                        help="Checkpoint directory")
    parser.add_argument("--checkpoint_freq", type=int, default=10,
                        help="Checkpoint frequency (epochs)")
    parser.add_argument("--verbose", action="store_true",
                        help="Print detailed epoch summaries")
    parser.add_argument("--resume", action="store_true",
                        help="Resume from checkpoint_best.npz in checkpoint directory "
                             "(if not specified, clears old checkpoints)")

    # TPU-native extensions
    parser.add_argument("--properties", type=str, default="tpsa",
                        help="Comma-separated property keys for conditioning "
                             "(e.g. tpsa,logp,mw)")
    parser.add_argument("--use_property_predictor", action="store_true",
                        help="Train the z->properties predictor head")
    parser.add_argument("--data_parallel", action="store_true",
                        help="Shard the batch over all visible devices")
    parser.add_argument("--model_parallel", type=int, default=1,
                        help="Tensor-parallel degree: shard embedding/fc_out/"
                             "LSTM gate matrices over a 'model' mesh axis. "
                             "Alone: a pure (1, N) mesh over the first N "
                             "devices; with --data_parallel: an "
                             "(n_devices/N, N) mesh — the data axis is "
                             "n_devices/N wide. Implies the GSPMD step path "
                             "and disables --use_pallas")
    parser.add_argument("--steps_per_dispatch", type=int, default=1,
                        help="Fuse K optimizer steps into one dispatched program")
    parser.add_argument("--sync_checkpoint", action="store_true",
                        help="Block the epoch loop on checkpoint writes "
                        "(default: the device fetch + npz write run on a "
                        "background thread)")
    parser.add_argument("--host_data", action="store_true",
                        help="Feed batches from host instead of keeping the "
                        "corpus device-resident (for corpora too large "
                        "for HBM)")
    parser.add_argument("--compute_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"], help="Matmul compute dtype")
    parser.add_argument("--use_pallas", action="store_true",
                        help="Use the fused Pallas kernels (LSTM sequence, "
                             "training decoder, generation)")
    parser.add_argument("--custom_vjp", action="store_true",
                        help="Hand-written big-matmul LSTM backward for "
                             "encoder layers beyond the Pallas kernels' "
                             "hidden<=512 range (measured +4%% on the "
                             "hidden-1024 scaled config)")
    parser.add_argument("--reference_zero_state", action="store_true",
                        help="Reproduce the reference decoder's zero-state quirk")
    parser.add_argument("--bidirectional", action="store_true",
                        help="Bi-directional encoder (what the reference README "
                             "claims; its code is forward-only)")
    parser.add_argument("--apply_dropout", action="store_true",
                        help="Actually apply the --dropout rate between encoder "
                             "layers (the reference accepts but ignores it)")
    parser.add_argument("--profile", type=str, default=None, metavar="LOGDIR",
                        help="Capture a jax.profiler trace of the first epoch")
    parser.add_argument("--synthetic", type=int, default=0, metavar="N",
                        help="Generate an N-molecule synthetic dataset at --data first")
    parser.add_argument("--eval_test", action="store_true",
                        help="Evaluate the held-out test split after training "
                             "(the reference builds the split but never uses it)")
    parser.add_argument("--best_metric", type=str, default="val_loss",
                        choices=["val_loss", "val_recon"],
                        help="Series that selects checkpoint_best. The "
                             "reference's val_loss (total incl. beta*KL) "
                             "favors EARLY low-beta epochs under annealing "
                             "for latent-heavy configs (measured: a "
                             "--free_bits 8 run's 'best' checkpoint is "
                             "epoch ~1, benchmarks/reconstruction_eval."
                             "json); val_recon compares a beta-independent "
                             "series instead. Resume compares the stored "
                             "best against the metric chosen NOW — keep "
                             "the flag consistent across a resumed run")
    parser.add_argument("--seed", type=int, default=67,
                        help="Seed for model init, shuffling, TF masks, and "
                             "reparameterization noise (reference fixes 67, "
                             "train.py:75). The 80/10/10 data split always "
                             "uses seed 67 — the reference's split is part "
                             "of the public surface and does not move with "
                             "this flag")
    from mlx_vae_tpu.utils.compile_cache import add_cache_flags
    add_cache_flags(parser)
    return parser


def main(argv=None):
    from mlx_vae_tpu.config import ModelConfig, TrainConfig
    from mlx_vae_tpu.data.prepare import make_synthetic_dataset
    from mlx_vae_tpu.data.split import load_and_split
    from mlx_vae_tpu.models import ARCVAE
    from mlx_vae_tpu.train.trainer import ARCVAETrainer
    from mlx_vae_tpu.utils.compile_cache import setup_cache_from_args

    args = build_parser().parse_args(argv)
    setup_cache_from_args(args)

    print("=" * 80)
    print("AR-CVAE Training (TPU-native)")
    print("=" * 80)
    print("\nConfiguration:")
    print(f"  Dataset: {args.data}")
    print(f"  Model: embedding={args.embedding_dim}, hidden={args.hidden_dim}, "
          f"latent={args.latent_dim}")
    print(f"  Training: epochs={args.epochs}, batch_size={args.batch_size}, "
          f"lr={args.learning_rate}")
    print(f"  Beta: start={args.beta_start}, end={args.beta_end}, "
          f"warmup={args.beta_warmup_epochs}")
    print(f"  Splits: train=0.8, val=0.1, test=0.1")
    print(f"  Devices: {jax.device_count()} ({jax.devices()[0].platform})")
    print("=" * 80)

    property_keys = tuple(k.strip() for k in args.properties.split(",") if k.strip())
    if len(property_keys) != args.num_conditions:
        print(f"  Note: num_conditions={args.num_conditions} adjusted to match "
              f"{len(property_keys)} property keys {property_keys}")
        args.num_conditions = len(property_keys)

    if args.synthetic:
        Path(args.data).parent.mkdir(parents=True, exist_ok=True)
        make_synthetic_dataset(n=args.synthetic, vocab_size=args.vocab_size,
                               path=args.data)
        print(f"✓ Generated synthetic dataset ({args.synthetic} molecules) at {args.data}")

    print("\nLoading dataset...")
    train_dataset, val_dataset, test_dataset, data = load_and_split(
        args.data, seed=67, property_keys=property_keys)

    print("✓ Property normalization (using train set stats):")
    print(f"  Mean: {train_dataset.properties_mean.flatten()}")
    print(f"  Std:  {train_dataset.properties_std.flatten()}")
    n_total = len(train_dataset) + len(val_dataset) + len(test_dataset)
    print(f"✓ Loaded {n_total:,} samples")
    print(f"  - Training: {len(train_dataset):,} samples")
    print(f"  - Validation: {len(val_dataset):,} samples")
    print(f"  - Test: {len(test_dataset):,} samples")

    checkpoint_dir = Path(args.checkpoint_dir)
    start_epoch = 0
    best_val_loss = float("inf")

    if args.resume:
        checkpoint_path = checkpoint_dir / "checkpoint_best.npz"
        if not checkpoint_path.exists():
            raise FileNotFoundError(f"Checkpoint not found: {checkpoint_path}")
        print(f"\nResuming from checkpoint: {checkpoint_path}")
    else:
        # Fresh runs wipe old checkpoints + plot (reference train.py:157-166).
        if checkpoint_dir.exists():
            print(f"\nClearing old checkpoints in {checkpoint_dir}")
            for f in checkpoint_dir.glob("*.npz"):
                f.unlink()
            plot = checkpoint_dir / "training_history.png"
            if plot.exists():
                plot.unlink()
            print("✓ Cleared old checkpoints")

    if args.model_parallel > 1 and args.use_pallas:
        print("⚠️  --model_parallel > 1 disables --use_pallas: the fused "
              "kernels have no partitioning rule for model-sharded operands "
              "(scan paths run instead; XLA partitions their matmuls)")
        args.use_pallas = False

    mcfg = ModelConfig(
        vocab_size=args.vocab_size,
        embedding_dim=args.embedding_dim,
        hidden_dim=args.hidden_dim,
        latent_dim=args.latent_dim,
        num_conditions=args.num_conditions,
        num_layers=args.num_layers,
        dropout=args.dropout,
        compute_dtype=args.compute_dtype,
        use_pallas=args.use_pallas,
        custom_vjp=args.custom_vjp,
        reference_zero_state=args.reference_zero_state,
        bidirectional=args.bidirectional,
        apply_dropout=args.apply_dropout,
    )
    tcfg = TrainConfig(
        epochs=args.epochs,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        beta_start=args.beta_start,
        beta_end=args.beta_end,
        beta_warmup_epochs=args.beta_warmup_epochs,
        lambda_prop=args.lambda_prop,
        lambda_collapse=args.lambda_collapse,
        free_bits=args.free_bits,
        lambda_mi=args.lambda_mi,
        target_mi=args.target_mi,
        grad_clip=args.grad_clip,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_freq=args.checkpoint_freq,
        data_parallel=args.data_parallel,
        model_parallel=args.model_parallel,
        steps_per_dispatch=args.steps_per_dispatch,
        async_checkpoint=not args.sync_checkpoint,
        host_data=args.host_data,
        seed=args.seed,
    )

    print("\nCreating VAE model...")
    vae = ARCVAE(mcfg, jax.random.PRNGKey(tcfg.seed),
                 with_predictor=args.use_property_predictor)
    print("✓ VAE model created")

    print("\nCreating trainer...")
    trainer = ARCVAETrainer(vae.params, mcfg, tcfg, train_dataset)
    trainer.alphabet = data.get("alphabet")
    print("✓ Trainer created")

    if args.resume:
        checkpoint_path = checkpoint_dir / "checkpoint_best.npz"
        from mlx_vae_tpu.train.checkpoint import load_checkpoint
        meta = load_checkpoint(checkpoint_path)
        best_val_loss = meta["best_val_loss"]
        loaded_epoch = trainer.load_checkpoint(checkpoint_path)
        start_epoch = loaded_epoch + 1
        print(f"✓ Loaded model weights from epoch {loaded_epoch}")
        print(f"  Resuming from epoch {start_epoch}")
        print(f"  Best validation loss so far: {best_val_loss:.4f}")

    from mlx_vae_tpu.utils.profiler import trace

    # The async save thread is a daemon: if an exception (or Ctrl-C) escapes
    # the epoch loop, the process would exit with an in-flight checkpoint
    # write unlanded — the very file failure recovery depends on. Always
    # join before unwinding (ADVICE r3).
    try:
        for epoch in range(start_epoch, args.epochs):
            print(f"\nEpoch {epoch + 1}/{args.epochs}")
            with trace(args.profile if epoch == start_epoch else None):
                metrics = trainer.train_epoch(epoch=epoch,
                                              total_epochs=args.epochs,
                                              val_dataset=val_dataset)

            trainer.history["epoch"].append(epoch)
            for k in ("train_loss", "train_recon", "train_kl",
                      "train_collapse", "train_prop", "val_loss", "val_recon",
                      "val_kl", "val_collapse", "val_prop", "beta",
                      "teacher_forcing", "mutual_info"):
                trainer.history[k].append(metrics[k])
            trainer.history["learning_rate"].append(args.learning_rate)

            is_best = metrics[args.best_metric] < best_val_loss
            if is_best:
                best_val_loss = metrics[args.best_metric]

            if (epoch + 1) % args.checkpoint_freq == 0 or is_best:
                trainer.save_checkpoint(epoch=epoch, is_best=is_best,
                                        best_val_loss=best_val_loss)
                trainer.save_history(args.checkpoint_dir)

            if args.verbose:
                print(f"\nEpoch {epoch + 1}/{args.epochs}: "
                      f"Train Loss: {metrics['train_loss']:.4f}, "
                      f"Val Loss: {metrics['val_loss']:.4f}, "
                      f"Beta: {metrics['beta']:.4f}")
    finally:
        trainer.join_saves()  # land any in-flight async checkpoint write
    trainer.plot_history(save_path=f"{args.checkpoint_dir}/training_history.png")

    from mlx_vae_tpu.train.history import anneal_best_warning
    warning = anneal_best_warning(trainer.history, args.best_metric)
    if warning:
        print(warning, file=sys.stderr)

    if args.eval_test:
        # Under an actual mesh partial batches are dropped (shapes must
        # divide the mesh), so a too-small split has nothing to evaluate;
        # otherwise _eval_batches handles partial batches fine. Key on the
        # mesh, not the flag: --data_parallel on a 1-device host forms no
        # mesh and evaluates partial batches normally.
        if trainer.mesh is not None and len(test_dataset) < args.batch_size:
            print(f"\nSkipping --eval_test: test split has "
                  f"{len(test_dataset)} samples < batch_size "
                  f"{args.batch_size} under --data_parallel")
        else:
            beta = trainer.compute_beta(args.epochs - 1)
            tm = trainer._eval_batches(test_dataset, beta, None, "Test")
            print(f"\nTest set ({len(test_dataset):,} samples): "
                  f"loss={tm['loss']:.4f} recon={tm['recon']:.4f} "
                  f"kl={tm['kl']:.4f}")

    print("\n✓ Training complete! ✓")


if __name__ == "__main__":
    main()
