"""Loss functions (pure jnp, all jit-safe).

Mirrors the reference ``losses/`` package surface
(``/root/reference/losses/__init__.py:6-19``).
"""

from mlx_vae_tpu.losses.recon import reconstruction_loss
from mlx_vae_tpu.losses.kl import kl_divergence
from mlx_vae_tpu.losses.enc import encoder_loss
from mlx_vae_tpu.losses.dec import decoder_loss
from mlx_vae_tpu.losses.info import mutual_information, posterior_collapse
from mlx_vae_tpu.losses.prop import property_prediction_loss
from mlx_vae_tpu.losses.stable import check_loss_sanity, kl_divergence_stable
from mlx_vae_tpu.losses.complete import complete_vae_loss

__all__ = [
    "reconstruction_loss",
    "kl_divergence",
    "encoder_loss",
    "decoder_loss",
    "mutual_information",
    "posterior_collapse",
    "property_prediction_loss",
    "check_loss_sanity",
    "kl_divergence_stable",
    "complete_vae_loss",
]
