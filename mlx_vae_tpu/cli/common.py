"""Shared CLI plumbing for checkpoint-driven tools (generate / optimize).

Property-stat resolution order (same contract as training: the model only
ever saw z-scored conditions, so raw user targets must be normalized by the
TRAIN-set stats): ``--no_normalize`` wins unconditionally (targets pass
through as already-normalized model units, even when stats exist), else an
explicit ``--data`` JSON, else the stats embedded in the checkpoint at save
time (``train/checkpoint.py``), else hard error.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def resolve_property_stats(data_path, no_normalize: bool, ckpt: dict,
                           num_conditions: int):
    """Return ``(mean [1,C], std [1,C], alphabet or None, train_ds or None)``.

    ``train_ds`` is the training split when ``--data`` was given (callers
    reuse its token matrix for novelty / reconstruction metrics), else None.
    """
    mean = std = None
    train_ds = None
    stats = ckpt.get("data_stats") or {}
    alphabet = stats.get("alphabet")
    if data_path:
        # Load even under --no_normalize: callers still want the alphabet
        # and the train split for novelty/reconstruction metrics.
        if not Path(data_path).exists():
            raise FileNotFoundError(f"--data {data_path} does not exist")
        from mlx_vae_tpu.data.split import load_and_split
        train_ds, _, _, data = load_and_split(
            data_path,
            property_keys=tuple(["tpsa", "logp", "mw"][:num_conditions]))
        mean, std = train_ds.properties_mean, train_ds.properties_std
        alphabet = data.get("alphabet") or alphabet
    elif stats.get("properties_mean") is not None and not no_normalize:
        mean = np.asarray(stats["properties_mean"], np.float32).reshape(1, -1)
        std = np.asarray(stats["properties_std"], np.float32).reshape(1, -1)
        print(f"Using property stats from checkpoint: mean={mean.flatten()} "
              f"std={std.flatten()}")

    if no_normalize:
        # The documented contract: targets are ALREADY in normalized model
        # units — identity stats regardless of what's available (previously
        # checkpoint/--data stats silently z-scored them anyway).
        print("WARNING: --no_normalize set; feeding --target values to the "
              "model without z-scoring.")
        mean = np.zeros((1, num_conditions), np.float32)
        std = np.ones((1, num_conditions), np.float32)
    elif mean is None:
        raise SystemExit(
            "ERROR: no property normalization stats available — the "
            "checkpoint predates stats embedding and --data was not "
            "given. Raw --target values would silently mis-condition "
            "generation. Pass --data <train json>, or --no_normalize "
            "to send targets to the model unscaled.")
    return mean, std, alphabet, train_ds


def normalized_targets(raw_targets, mean, std, num_conditions: int):
    """Validate count and z-score the raw CLI targets to ``[1, C]``."""
    if len(raw_targets) != num_conditions:
        raise SystemExit(
            f"ERROR: --target has {len(raw_targets)} value(s) but the "
            f"checkpoint was trained with num_conditions="
            f"{num_conditions} — pass exactly one target per "
            f"condition (training order, e.g. tpsa,logp,mw) so each "
            f"property is conditioned on its own value.")
    return (np.asarray(raw_targets, np.float32)[None, :] - mean) / std
