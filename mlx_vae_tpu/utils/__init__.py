from mlx_vae_tpu.utils.tree import (
    global_norm,
    tree_scale,
    tree_to_numpy,
    tree_from_numpy,
    tree_zeros_like,
)

__all__ = [
    "global_norm",
    "tree_scale",
    "tree_to_numpy",
    "tree_from_numpy",
    "tree_zeros_like",
]
