from mlx_vae_tpu.ops.lstm import (
    init_lstm_params,
    lstm_cell,
    lstm_gates,
    lstm_sequence,
)
from mlx_vae_tpu.ops.sampling import sample_logits

__all__ = [
    "init_lstm_params",
    "lstm_cell",
    "lstm_gates",
    "lstm_sequence",
    "sample_logits",
]
