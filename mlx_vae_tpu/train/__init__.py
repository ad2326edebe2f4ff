from mlx_vae_tpu.train.trainer import ARCVAETrainer
from mlx_vae_tpu.train.optim import adam_init, adam_update, clip_by_global_norm
from mlx_vae_tpu.train.checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "ARCVAETrainer",
    "adam_init",
    "adam_update",
    "clip_by_global_norm",
    "save_checkpoint",
    "load_checkpoint",
]
