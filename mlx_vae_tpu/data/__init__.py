from mlx_vae_tpu.data.dataset import MoleculeDataset
from mlx_vae_tpu.data.split import load_and_split, split_indices

__all__ = ["MoleculeDataset", "load_and_split", "split_indices"]
