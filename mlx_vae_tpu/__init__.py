"""mlx_vae_tpu — a TPU-native (JAX / XLA / Pallas / pjit) AR-CVAE molecular
generation framework.

Rebuilds the full capability surface of the MLX reference (Raiden-Makoto/MLX-VAE)
as a brand-new TPU-first design:

* functional models (param pytrees, explicit PRNG keys) instead of stateful
  ``nn.Module`` objects,
* ``lax.scan`` recurrence over fused LSTM cells instead of per-token Python
  loops (reference ``models/decoder.py:152-185``),
* one jitted train step (loss + grads + clip + two Adam updates) instead of
  per-op lazy eval (reference ``trainer.py:242-416``),
* pjit/``jax.sharding`` data parallelism over a TPU mesh (the reference has no
  distribution of any kind),
* a jitted batched generation kernel with real temperature-categorical
  sampling (upgrading the reference's argmax TODO at
  ``models/decoder_sampling.py:115-117``).

Public surface parity: ``train.py`` CLI flags and defaults, ``.npz``
checkpoint key contract, ``training_history.json`` schema and the 2x3
history plot all match the reference.
"""

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # The axon TPU plugin overrides JAX_PLATFORMS through jax.config at
    # import time, silently sending "CPU-only" subprocesses (diagnostics,
    # CLI smoke tests) to the remote TPU where every jitted program costs
    # 60-120s to compile. Restore the standard env-var semantics: an
    # explicit JAX_PLATFORMS always wins. Must run before any backend
    # initializes, hence here at package import.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

from mlx_vae_tpu.version import __version__
from mlx_vae_tpu.config import ModelConfig, TrainConfig

__all__ = ["__version__", "ModelConfig", "TrainConfig"]
