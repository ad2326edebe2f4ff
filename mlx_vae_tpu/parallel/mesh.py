"""Device mesh + sharding layer.

The reference has **no** distribution of any kind (SURVEY.md §2.2 — single
process, single Metal device). This module *introduces* it TPU-natively:

* ``make_mesh`` builds a 1D ``('data',)`` or 2D ``('data', 'model')``
  ``jax.sharding.Mesh`` over the visible devices (e.g. a v5e-8 slice, where
  the collectives ride ICI).
* Data parallelism: the batch is sharded on ``'data'``; because every loss
  term is a batch mean, XLA's SPMD partitioner inserts the gradient
  all-reduce (psum over ICI) automatically inside the one jitted train step —
  the role NCCL would play in a torch port, with zero framework code.
* Tensor parallelism (``--model_parallel N`` on the train CLI, wired
  end-to-end through ``ARCVAETrainer``'s GSPMD step path): the two
  vocab-facing matrices (decoder output projection, embeddings) and the
  LSTM gate matrices shard on ``'model'`` via ``param_pspec``; everything
  else replicates. Requires ``use_pallas=False`` — the fused kernels hold
  whole gate/vocab blocks in VMEM and expose no partitioning rule, so the
  scan paths (whose matmuls XLA partitions freely) run instead; see
  ``tests/test_parallel.py::test_model_parallel_trainer_epoch_matches_single_device``.

No collective is ever written by hand here: shardings-in, XLA-collectives-out
(the scaling-book recipe).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              model_parallel: int = 1) -> Mesh:
    """Mesh over all (or given) devices: ``(data, model)`` axes."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) axis on 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Parameter leaves that shard on the 'model' axis (by trailing path), chosen
# so each shard keeps whole rows/columns of MXU tiles:
#   embeddings [V, E]        -> split vocab rows
#   fc_out.weight [V, H]     -> split vocab rows (column-parallel logits)
#   LSTM Wx/Wh [4H, in]      -> split gate rows
_MODEL_SHARDED = {
    ("embedding", "weight"): P("model", None),
    ("fc_out", "weight"): P("model", None),
    ("fc_out", "bias"): P("model"),
    ("Wx",): P("model", None),
    ("Wh",): P("model", None),
    ("bias",): P("model"),
}


def param_pspec(path: tuple) -> P:
    """PartitionSpec for a param leaf, keyed by its tree path suffix."""
    names = tuple(
        p.key if hasattr(p, "key") else str(p) for p in path
    )
    for suffix, spec in _MODEL_SHARDED.items():
        if names[-len(suffix):] == suffix:
            return spec
    return P()


def shard_params(mesh: Mesh, params, model_parallel: bool = False):
    """device_put a param tree: replicated, or model-axis sharded leaves.

    Leaves whose dimensions don't divide the mesh axis (e.g. a 1-element
    predictor-head bias) fall back to replication.
    """
    if not model_parallel:
        return jax.device_put(params, replicated_sharding(mesh))

    def put(path, leaf):
        spec = param_pspec(path)
        for dim, axis in zip(leaf.shape, spec):
            if axis is not None and dim % mesh.shape[axis] != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)
