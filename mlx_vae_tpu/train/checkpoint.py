"""`.npz` checkpointing with the reference key contract.

Public surface (SURVEY.md §3.4, ``/root/reference/trainer.py:577-603``):
``checkpoint_epoch_{E:03d}.npz`` / ``checkpoint_best.npz`` containing
``epoch``, ``encoder_weights``, ``decoder_weights``,
``encoder_optimizer_state``, ``decoder_optimizer_state``, ``history``
(+ optional ``predictor_weights`` / ``predictor_optimizer_state``), plus
``best_val_loss`` (read by the reference's resume path,
``/root/reference/train.py:152``).

Weights are nested dicts of numpy arrays (pickled object arrays inside the
npz, like the reference's ``np.savez`` of MLX ``parameters()`` dicts).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path
from typing import Optional

import numpy as np

from mlx_vae_tpu.utils.tree import tree_from_numpy, tree_to_numpy


def build_checkpoint_host(epoch: int, params: dict, opt_states: dict,
                          history: dict, best_val_loss: float = float("inf"),
                          data_stats: Optional[dict] = None) -> dict:
    """Fetch every device array ONCE into the host-side checkpoint dict.

    Split out from :func:`save_checkpoint` so one device→host fetch can feed
    multiple file writes (the trainer writes ``checkpoint_epoch_NNN`` and
    ``checkpoint_best`` from the same state — the reference fetches twice,
    ``/root/reference/trainer.py:591-597``), and so the fetch+serialize can
    run on a background thread (``trainer.save_checkpoint``).

    ``data_stats`` (optional, extra keys beyond the reference contract):
    ``{"properties_mean", "properties_std", "alphabet"}`` — the train-set
    normalization stats and token alphabet, stored so bulk generation can
    z-score raw property targets without re-reading the dataset (ADVICE r1:
    previously a missing ``--data`` silently meant mean=0/std=1)."""
    ckpt = {
        "epoch": epoch,
        "encoder_weights": tree_to_numpy(params["encoder"]),
        "decoder_weights": tree_to_numpy(params["decoder"]),
        "encoder_optimizer_state": tree_to_numpy(opt_states["encoder"]),
        "decoder_optimizer_state": tree_to_numpy(opt_states["decoder"]),
        "history": history,
        "best_val_loss": best_val_loss,
    }
    if "predictor" in params:
        ckpt["predictor_weights"] = tree_to_numpy(params["predictor"])
        ckpt["predictor_optimizer_state"] = tree_to_numpy(opt_states["predictor"])
    if data_stats:
        for k in ("properties_mean", "properties_std"):
            if data_stats.get(k) is not None:
                ckpt[k] = np.asarray(data_stats[k], np.float32)
        if data_stats.get("alphabet"):
            ckpt["alphabet"] = np.asarray(list(data_stats["alphabet"]), object)
    return ckpt


def write_checkpoint(path, ckpt: dict) -> None:
    """Atomically serialize a host checkpoint dict to ``path``.

    Written to ``<path>.tmp.<pid>`` then ``os.replace``d, so a reader (or a
    preempted run's ``--resume``) can never observe a truncated
    ``checkpoint_best.npz`` — the write either fully lands or the old file
    survives."""
    path = Path(path)
    tmp = path.with_name(f"{path.name}.tmp.{os.getpid()}")
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **ckpt)
        os.replace(tmp, path)
    finally:
        tmp.unlink(missing_ok=True)


def save_checkpoint(path, epoch: int, params: dict, opt_states: dict,
                    history: dict, best_val_loss: float = float("inf"),
                    data_stats: Optional[dict] = None) -> None:
    """One-call fetch + atomic write (see :func:`build_checkpoint_host`)."""
    write_checkpoint(path, build_checkpoint_host(
        epoch, params, opt_states, history, best_val_loss, data_stats))


def _convert_mlx_optimizer_state(state: dict) -> dict:
    """MLX ``optimizer.state`` layout -> this framework's Adam state.

    A checkpoint written by the REFERENCE (``/root/reference/trainer.py:583-584``
    saves ``optimizer.state`` verbatim) stores the MLX layout: a tree
    mirroring the parameters whose leaves are ``{"m": arr, "v": arr}`` dicts,
    plus scalar ``step`` / ``learning_rate`` entries at the top. Ours is
    ``{"step", "m": <params tree>, "v": <params tree>}`` (``train/optim.py``).
    Converting here makes ``--resume`` work directly from a
    reference-produced checkpoint (both Adams are bias-correction-free, so
    the m/v/step triple is the complete optimizer state in either format;
    ``learning_rate`` is a CLI flag on our side and is dropped).
    """
    def walk(node):
        if (isinstance(node, dict) and {"m", "v"} <= set(node)
                and not isinstance(node["m"], dict)):
            return node["m"], node["v"]
        ms, vs = {}, {}
        for k, val in node.items():
            if k in ("step", "learning_rate"):
                continue
            ms[k], vs[k] = walk(val)
        return ms, vs

    m, v = walk(state)
    step = int(np.asarray(state.get("step", 0)))
    return {"step": np.int32(step), "m": m, "v": v}


def _is_mlx_optimizer_state(state: dict) -> bool:
    return isinstance(state, dict) and set(state) != {"step", "m", "v"}


def stale_best_notice(path, epoch: int) -> Optional[str]:
    """Notice when ``checkpoint_best.npz`` is far older than its siblings.

    Under beta annealing the reference's val_loss-based best selection can
    land on a pre-anneal epoch whose prior sampling is broken (measured:
    benchmarks/conditioning_strength_study.json, arm B_best = epoch 0,
    prior decode 0.28 vs 1.00 at the same run's final epoch). Every
    checkpoint consumer (generate/encode/serve/optimize/interpolate
    default to checkpoint_best) gets this cheap filename-level check: warn
    when sibling ``checkpoint_epoch_*.npz`` files show the run continued
    at least 5 epochs AND twice as long past the loaded "best" epoch.
    """
    p = Path(path)
    if p.name != "checkpoint_best.npz":
        return None
    sibling_epochs = []
    for s in p.parent.glob("checkpoint_epoch_*.npz"):
        try:
            sibling_epochs.append(int(s.stem.rsplit("_", 1)[1]))
        except ValueError:
            continue
    if not sibling_epochs:
        return None
    last = max(sibling_epochs)
    if last - epoch < 5 or (epoch + 1) * 2 > last + 1:
        return None
    return (
        f"note: {p} is epoch {epoch}, but sibling checkpoints in "
        f"{p.parent} reach epoch {last}. If this run annealed beta, "
        "val_loss-selected 'best' checkpoints from early epochs can have "
        "prior-mismatched posteriors that break sampling — consider "
        f"checkpoint_epoch_{last:03d}.npz or retraining with "
        "--best_metric val_recon."
    )


def load_checkpoint(path) -> dict:
    """Load an .npz checkpoint -> dict with device-array params/opt states.

    Accepts both this framework's checkpoints and ones produced by the
    reference itself (same key contract by design; the reference omits
    ``best_val_loss``/``predictor_optimizer_state`` and uses the MLX
    optimizer-state layout — all handled here), so a reference user can
    point ``--resume``/``generate.py``/``encode.py`` at their existing
    ``checkpoint_best.npz``. Caveat: the reference pickles live ``mx.array``
    objects inside the npz; if numpy cannot unpickle them without ``mlx``
    installed, convert once on the MLX machine:
    ``np.savez(out, **{k: v for k, v in np.load(p, allow_pickle=True).items()})``
    after mapping leaves through ``np.array`` (see README "Migrating from
    the reference").
    """
    raw = np.load(str(path), allow_pickle=True)
    out = {
        "epoch": int(raw["epoch"]),
        "best_val_loss": float(raw["best_val_loss"]) if "best_val_loss" in raw
        else float("inf"),
        "history": raw["history"].item() if "history" in raw else None,
    }
    params, opt_states = {}, {}
    for name in ("encoder", "decoder", "predictor"):
        wkey, okey = f"{name}_weights", f"{name}_optimizer_state"
        if wkey in raw:
            params[name] = tree_from_numpy(raw[wkey].item())
        if okey in raw:
            state = raw[okey].item()
            if _is_mlx_optimizer_state(state):
                state = _convert_mlx_optimizer_state(state)
            opt_states[name] = tree_from_numpy(state)
    out["params"] = params
    out["opt_states"] = opt_states
    out["data_stats"] = {
        "properties_mean": np.asarray(raw["properties_mean"])
        if "properties_mean" in raw else None,
        "properties_std": np.asarray(raw["properties_std"])
        if "properties_std" in raw else None,
        "alphabet": [str(t) for t in raw["alphabet"]]
        if "alphabet" in raw else None,
    }
    notice = stale_best_notice(path, out["epoch"])
    if notice:
        print(notice, file=sys.stderr)
    return out


def latest_best(checkpoint_dir) -> Optional[Path]:
    p = Path(checkpoint_dir) / "checkpoint_best.npz"
    return p if p.exists() else None
