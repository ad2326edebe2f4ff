"""Configuration dataclasses.

The reference configures everything through 23 argparse flags
(``/root/reference/train.py:18-56``) plus hard-coded constants scattered in
``trainer.py``. Here the same knobs (same names, same defaults) live in two
frozen — therefore hashable, therefore jit-static — dataclasses.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
}


@dataclass(frozen=True)
class ModelConfig:
    """Static model hyperparameters.

    Defaults mirror ``/root/reference/train.py:25-31``. ``dropout`` holds the
    rate; by default it is NOT applied — exactly like the reference, which
    accepts the flag and never instantiates a Dropout layer
    (``/root/reference/models/encoder.py:24``). Setting ``apply_dropout=True``
    (below) opts into really applying it between encoder layers.
    """

    vocab_size: int = 80
    embedding_dim: int = 128
    hidden_dim: int = 256
    latent_dim: int = 128
    num_conditions: int = 1
    num_layers: int = 2
    dropout: float = 0.2

    # Token conventions (reference ``models/decoder.py:26-27,146``).
    pad_token: int = 0
    start_token: int = 0
    end_token: int = 2

    # Bi-directional encoder. The reference README advertises
    # "Bi-directional processing" (``README.md:17,46``) but its code runs
    # forward-only LSTMs (``models/encoder.py:50-58``); default False matches
    # the code, True delivers what the README claims (per-layer forward +
    # reverse scans, concatenated features).
    bidirectional: bool = False
    # Real dropout between encoder LSTM layers (rate = ``dropout``). The
    # reference accepts the rate but never applies it (SURVEY.md §2.1);
    # default False matches that behavior.
    apply_dropout: bool = False

    # TPU-specific knobs (no reference equivalent).
    compute_dtype: str = "float32"  # matmul input dtype; "bfloat16" for MXU speed
    use_pallas: bool = False  # fused Pallas LSTM-cell gate kernel
    # lax.scan unroll factor for the recurrent loops (measured: unrolling
    # HURTS on v5e for these step sizes — keep 1; the knob remains for other
    # shapes).
    scan_unroll: int = 1
    # Rematerialize scan-step internals in the backward pass instead of
    # storing per-step gate activations (trades ~1 extra fwd matmul per step
    # for ~8GB of HBM residual traffic at batch 1024; measured +23% step
    # throughput on v5e).
    remat: bool = True
    # Decoder-step embedding lookup as one-hot @ table (MXU matmul both ways)
    # instead of gather (whose backward is a per-step scatter-add).
    embed_onehot: bool = True
    # Hand-written LSTM-sequence backward (see ops/lstm.py
    # ``lstm_sequence_cv``): weight/input gradients as single large matmuls
    # instead of per-timestep accumulations. Measured SLOWER than the
    # remat'd autodiff scan on v5e at these sizes (residual traffic beats
    # recompute), so off by default; kept as an option for larger hidden
    # sizes where the tradeoff flips.
    custom_vjp: bool = False
    # Reproduce the reference decoder's load-bearing quirk: the initialized
    # (h, c) are never threaded into the per-timestep LSTM calls, so every
    # timestep runs from zero state (``/root/reference/models/decoder.py:143,166-168``).
    # Default False = the *intended* semantics (state carried via lax.scan).
    reference_zero_state: bool = False

    @property
    def dtype(self):
        return _DTYPES[self.compute_dtype]

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters; defaults mirror ``/root/reference/train.py:34-50``
    and the hard-coded constants listed in SURVEY.md §5 (config/flag system).
    """

    epochs: int = 30
    batch_size: int = 32
    learning_rate: float = 2e-4
    beta_start: float = 0.0
    beta_end: float = 0.05
    beta_warmup_epochs: int = 20
    lambda_prop: float = 0.1
    lambda_collapse: float = 0.001
    free_bits: float = 1.0
    lambda_mi: float = 0.01
    grad_clip: float = 1.0
    checkpoint_dir: str = "./checkpoints"
    checkpoint_freq: int = 10

    # Hard-coded constants in the reference.
    target_mi: float = 4.85  # trainer.py:152,286
    seed: int = 67  # train.py:75
    # Teacher-forcing schedule max(TF_FLOOR, TF_START - TF_DECAY*progress)
    # (trainer.py:113).
    tf_start: float = 0.9
    tf_decay: float = 0.4
    tf_floor: float = 0.5
    # True-train-loss batch count (trainer.py:202) and component sampling
    # period (trainer.py:336).
    true_loss_batches: int = 20
    component_sample_every: int = 25
    # Loss-explosion guard thresholds (trainer.py:369).
    explosion_max: float = 2000.0
    explosion_min: float = -10.0

    # Adam: the reference uses MLX ``optim.Adam`` whose update rule has no
    # bias correction. Keep that as the parity default; flip on for standard
    # Adam.
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    adam_bias_correction: bool = False

    # TPU-specific (no reference equivalent).
    data_parallel: bool = False  # shard the batch over all visible devices
    # Tensor parallelism degree: shard the vocab-facing matrices (embedding,
    # fc_out) and LSTM gate matrices over a 'model' mesh axis
    # (parallel/mesh.py). >1 routes training through GSPMD auto-partitioned
    # steps (plain jit with sharded params) instead of shard_map, and
    # requires use_pallas=False — the Pallas kernels hold whole gate/vocab
    # blocks in VMEM and have no partitioning rule for model-sharded
    # operands, so XLA cannot split them (the CLI auto-disables Pallas with
    # a warning). Without data_parallel the mesh is PURE tp — (1, tp) over
    # the first tp devices; with data_parallel the remaining devices form
    # the 'data' axis (n_devices/tp × tp). Capability headroom for the
    # scaled config.
    model_parallel: int = 1
    # Fuse K optimizer steps into one dispatched program (lax.scan over
    # stacked batches). Amortizes per-dispatch overhead (~2.5ms measured on
    # the tunneled v5e); metrics come back stacked [K].
    steps_per_dispatch: int = 1
    # Checkpoint saves run the device→host fetch + npz write on a
    # background thread so the epoch loop never stalls on them (the thread
    # fetches an on-device snapshot copy — the originals get donated away
    # by the next train step; see trainer.save_checkpoint).
    # --sync_checkpoint restores the reference's blocking behavior.
    async_checkpoint: bool = True
    # Opt out of the device-resident corpus feed (single-device default):
    # normally the tokenized dataset is uploaded to HBM once and batches are
    # fed as [B] index arrays (the gather runs inside the jitted step) —
    # shipping tokens per batch through a tunneled host<->device link costs
    # more than training on them. Set for corpora too large for HBM.
    host_data: bool = False

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)

    def compute_beta(self, epoch: int) -> float:
        """Linear KL-weight anneal (reference ``trainer.py:102-108``)."""
        if epoch < self.beta_warmup_epochs:
            return float(
                self.beta_start
                + (self.beta_end - self.beta_start) * (epoch / self.beta_warmup_epochs)
            )
        return float(self.beta_end)

    def compute_teacher_forcing_ratio(self, epoch: int, total_epochs: int) -> float:
        """TF decay 0.9 -> 0.5 over all epochs (reference ``trainer.py:110-114``)."""
        progress = epoch / total_epochs
        return float(max(self.tf_floor, self.tf_start - self.tf_decay * progress))
