"""Property prediction loss (MSE).

Semantics match ``/root/reference/losses/prop.py:29-40`` with the call-site
bug **fixed**: the reference's signature requires
``(z, predicted, target, ...)`` but ``complete_vae_loss.py:65`` calls it as
``(predicted, conditions, reduction=...)`` — a TypeError whenever a property
predictor exists (it never fires there only because the predictor is always
``None``; SURVEY.md §2.1). Here the unused ``z`` argument is dropped and the
wiring in ``losses/complete.py`` passes ``(predicted, target)`` correctly.
"""

from __future__ import annotations

import jax.numpy as jnp


def property_prediction_loss(predicted_properties: jnp.ndarray,
                             target_properties: jnp.ndarray,
                             property_scales: jnp.ndarray | None = None,
                             reduction: str = "mean") -> jnp.ndarray:
    mse = jnp.square(predicted_properties.astype(jnp.float32)
                     - target_properties.astype(jnp.float32))
    if property_scales is not None:
        mse = mse / (jnp.square(property_scales) + 1e-8)
    if reduction == "mean":
        return jnp.mean(mse)
    if reduction == "sum":
        return jnp.sum(mse)
    return mse
