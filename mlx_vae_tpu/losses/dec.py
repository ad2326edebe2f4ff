"""Stage-wise decoder-only loss (capability parity with
``/root/reference/losses/dec.py:29-35``)."""

from __future__ import annotations

from mlx_vae_tpu.losses.recon import reconstruction_loss
from mlx_vae_tpu.models.decoder import decoder_apply


def decoder_loss(params, cfg, z, conditions, target_seq, key,
                 teacher_forcing_ratio: float = 0.9):
    """Reconstruction CE of decoding ``z`` against ``target_seq``."""
    logits = decoder_apply(params, cfg, z, conditions, target_seq=target_seq,
                           teacher_forcing_ratio=teacher_forcing_ratio, key=key)
    return reconstruction_loss(logits, target_seq, reduction="mean")
