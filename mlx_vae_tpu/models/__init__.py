from mlx_vae_tpu.models.encoder import (
    init_encoder_params,
    encoder_apply,
    reparameterize,
)
from mlx_vae_tpu.models.decoder import (
    init_decoder_params,
    decoder_apply,
    initialize_hidden_state,
)
from mlx_vae_tpu.models.sampling import generate_with_temperature
from mlx_vae_tpu.models.predictor import init_predictor_params, predictor_apply
from mlx_vae_tpu.models.latent_opt import latent_objective, optimize_latent
from mlx_vae_tpu.models.vae import ARCVAE

__all__ = [
    "init_encoder_params",
    "encoder_apply",
    "reparameterize",
    "init_decoder_params",
    "decoder_apply",
    "initialize_hidden_state",
    "generate_with_temperature",
    "init_predictor_params",
    "predictor_apply",
    "latent_objective",
    "optimize_latent",
    "ARCVAE",
]
