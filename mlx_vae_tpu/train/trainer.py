"""Training engine.

Capability parity with ``ARCVAETrainerWithLoss``
(``/root/reference/trainer.py:12-736``):

* β linear anneal and teacher-forcing decay schedules,
* per-epoch: TF training pass, 20-batch no-TF "true train loss" (so reported
  train/val curves are comparable — reference ``trainer.py:202,225``), full
  validation at TF=0, latent-stats + MI monitoring on one 64-batch,
* joint global-norm grad clipping, two separate Adam states,
* loss-explosion guard (non-finite / >2000 / < -10) with component and
  latent-bound dump — like the reference, the guard only skips the batch
  from *accounting*; the parameter update has already been applied
  (``trainer.py:320-401`` applies updates before the check),
* ``.npz`` checkpoint save/load (key contract in ``train/checkpoint.py``),
  history JSON and the 2x3 plot grid.

TPU-first differences:

* the whole batch is ONE jitted step (``train/steps.py``) — no per-op host
  syncs; the loss scalar is read back with a one-step lag so step N+1 is
  already dispatched while N's guard check runs;
* loss components are returned from the same forward every step (the
  reference runs an *extra* loss-only forward every 25 batches,
  ``trainer.py:336-363``); the 25-batch sampling cadence for the history
  averages is preserved;
* input batches are double-buffer prefetched to device;
* optional data parallelism: with ``TrainConfig.data_parallel`` the batch is
  sharded over a ``('data',)`` mesh and XLA inserts the gradient all-reduce
  over ICI inside the same jitted step (partial trailing batches are dropped
  in this mode — shapes must divide the mesh).
"""

from __future__ import annotations

import os
import shutil
import threading
from collections import OrderedDict
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    from tqdm import tqdm
except ImportError:  # pragma: no cover
    def tqdm(it, **kw):
        return it

from mlx_vae_tpu.config import ModelConfig, TrainConfig
from mlx_vae_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_params,
)
from mlx_vae_tpu.train import checkpoint as ckpt_io
from mlx_vae_tpu.train.history import make_history, plot_history, save_history
from mlx_vae_tpu.train.optim import adam_init
from mlx_vae_tpu.train.steps import (
    eval_step,
    eval_step_gather,
    monitor_step,
    multi_train_step,
    multi_train_step_gather,
    train_step,
    train_step_gather,
)
from mlx_vae_tpu.utils.prefetch import prefetch_to_device


@jax.jit
def _device_copy(tree):
    """Fresh on-device buffers for every leaf (one dispatched program).

    ``x + 0`` rather than a bare identity so no aliasing optimization can
    ever hand back the input buffer: the copy's outputs must survive the
    donation of the originals by the next train step (see
    ``save_checkpoint``)."""
    return jax.tree_util.tree_map(
        lambda x: x + jnp.zeros((), x.dtype), tree)


class ARCVAETrainer:
    def __init__(
        self,
        params: dict,
        mcfg: ModelConfig,
        tcfg: TrainConfig,
        dataset,
        seed: Optional[int] = None,
    ):
        """``params`` is the ARCVAE param pytree
        (``{"encoder", "decoder"[, "predictor"]}``)."""
        self.mcfg = mcfg
        self.tcfg = tcfg
        self.dataset = dataset
        self.batch_size = tcfg.batch_size
        self.learning_rate = tcfg.learning_rate

        self._key = jax.random.PRNGKey(tcfg.seed if seed is None else seed)
        self._shuffle_rng = np.random.default_rng(tcfg.seed if seed is None else seed)

        self.checkpoint_dir = Path(tcfg.checkpoint_dir)
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)

        # Token alphabet (set by the CLI when the dataset ships one) — stored
        # in checkpoints alongside the property normalization stats so
        # generation is self-contained.
        self.alphabet = None

        # In-flight async checkpoint save (at most one; see save_checkpoint).
        self._save_thread: Optional[threading.Thread] = None
        self._save_error: Optional[BaseException] = None

        self.history = make_history()

        # Device placement / data + tensor parallelism.
        self.mesh = None
        self._batch_sharding = None
        tp = max(1, tcfg.model_parallel)
        if tp > 1 and len(jax.devices()) < tp:
            # Refuse rather than silently train single-device: the user
            # asked for tensor parallelism they would not be getting
            # (code-review r3).
            raise ValueError(
                f"model_parallel={tp} requires at least {tp} devices; "
                f"{len(jax.devices())} visible")
        use_mesh = (tcfg.data_parallel or tp > 1) and len(jax.devices()) > 1
        if use_mesh:
            if tcfg.data_parallel:
                devices = None  # all visible: data = n_devices / tp
            else:
                # --model_parallel alone means PURE tensor parallelism:
                # a (1, tp) mesh over the first tp devices. Spanning every
                # visible device here would silently add data parallelism
                # the user never enabled — and surface as a baffling
                # batch-divisibility error (code-review r3).
                devices = jax.devices()[:tp]
            self.mesh = make_mesh(devices, model_parallel=tp)
            n_data = self.mesh.shape["data"]
            if tcfg.batch_size % n_data != 0:
                raise ValueError(
                    f"batch_size {tcfg.batch_size} must divide over {n_data} "
                    "data-parallel devices")
            self._batch_sharding = batch_sharding(self.mesh)
            if tp > 1 and mcfg.use_pallas:
                raise ValueError(
                    "model_parallel > 1 requires use_pallas=False: the fused "
                    "kernels hold whole gate/vocab blocks in VMEM and have "
                    "no partitioning rule for model-sharded operands "
                    "(config.py TrainConfig.model_parallel)")
            params = shard_params(self.mesh, params, model_parallel=tp > 1)

        self.params = params
        self.opt_states = {name: adam_init(p) for name, p in params.items()}

        # Device-resident corpus: the tokenized data easily fits HBM while
        # the host<->device link on tunneled backends moves ~35MB/s —
        # shipping a K=8 batch-4096 chunk costs more than training on it
        # (241 vs 164ms measured). Batches are fed as [B] index arrays; the
        # gather + uint8->int32 widen run inside the jitted step. Under a
        # mesh the corpus is REPLICATED per device and each shard gathers
        # its local [B/n] index slice (gather-fed shard_map / GSPMD steps).
        self._device_data = not tcfg.host_data
        # The device-corpus cache is CLASS-level: sweep/study harnesses
        # build a fresh trainer per arm over the same dataset, and on
        # tunneled backends re-uploading the corpus per trainer costs
        # minutes (the relay's bulk bandwidth varies 0.1-35 MB/s by day).
        # Keyed by dataset identity + sharding; the identity check in
        # _dev_data still guards against id() reuse after GC.

        # Step routing under a mesh:
        #   tp == 1 -> shard_map (explicit pmean; Pallas kernels run
        #              per-shard unchanged),
        #   tp > 1  -> GSPMD auto-partitioning (plain jitted steps over
        #              sharded param trees; XLA inserts the collectives).
        self._gspmd = tp > 1
        self._shmap_step = None
        self._shmap_eval = None
        self._shmap_step_gather = None
        self._shmap_multi_gather = None
        self._shmap_eval_gather = None
        if self.mesh is not None:
            if self._gspmd:
                self.opt_states = shard_params(self.mesh, self.opt_states,
                                               model_parallel=True)
            else:
                self.opt_states = jax.device_put(
                    self.opt_states, replicated_sharding(self.mesh))
                from mlx_vae_tpu.train.steps import (
                    make_shmap_eval_step,
                    make_shmap_eval_step_gather,
                    make_shmap_multi_train_step_gather,
                    make_shmap_train_step,
                    make_shmap_train_step_gather,
                )
                self._shmap_step = make_shmap_train_step(self.mesh, mcfg, tcfg)
                self._shmap_eval = make_shmap_eval_step(self.mesh, mcfg, tcfg)
                self._shmap_step_gather = make_shmap_train_step_gather(
                    self.mesh, mcfg, tcfg)
                self._shmap_multi_gather = make_shmap_multi_train_step_gather(
                    self.mesh, mcfg, tcfg)
                self._shmap_eval_gather = make_shmap_eval_step_gather(
                    self.mesh, mcfg, tcfg)

    # ---------------------------------------------------------------- utils

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def compute_beta(self, epoch: int) -> float:
        return self.tcfg.compute_beta(epoch)

    def compute_teacher_forcing_ratio(self, epoch: int, total_epochs: int) -> float:
        return self.tcfg.compute_teacher_forcing_ratio(epoch, total_epochs)

    @property
    def _drop_partial(self) -> bool:
        """Partial batches are dropped only when the batch axis is actually
        SPLIT over devices (data axis > 1) — an indivisible remainder cannot
        shard. A pure-TP mesh (data axis == 1, --model_parallel alone)
        shards parameters, not the batch, so any batch size is valid and
        trailing partial batches run exactly as on a single device
        (code-review r3: dropping them starved small val splits to the
        +inf sentinel and checkpoint_best was never written)."""
        return self.mesh is not None and self.mesh.shape["data"] > 1

    def _batches(self, dataset, shuffle: bool, drop_last: Optional[bool] = None):
        if drop_last is None:
            drop_last = self._drop_partial
        it = dataset.to_batches(self.batch_size, shuffle=shuffle,
                                rng=self._shuffle_rng if shuffle else None,
                                drop_last=drop_last)
        return prefetch_to_device(it, size=2, sharding=self._batch_sharding)

    # Train + val + one ad-hoc eval set; a 4th distinct dataset evicts the
    # least-recently-used entry so HBM can't accumulate stale corpora
    # (ADVICE r2).
    _DEV_CACHE_MAX = 3
    _dev_arrays: "OrderedDict" = OrderedDict()  # class-level, see __init__

    def _dev_data(self, dataset):
        """Device-resident (tokens, normalized properties) for ``dataset``
        (uploaded once per process, uint8 when the vocab fits a byte). The
        dataset object is kept in the cache entry: caching by ``id()``
        alone would silently serve stale device arrays if a dataset were
        garbage collected and a new one allocated at the same address."""
        key = (id(dataset), self.mcfg.vocab_size <= 255,
               repr(self._corpus_sharding()))
        entry = ARCVAETrainer._dev_arrays.get(key)
        if entry is None or entry[0] is not dataset:
            toks = dataset.molecules
            if self.mcfg.vocab_size <= 255:
                toks = toks.astype(np.uint8)
            entry = (
                dataset,
                jax.device_put(toks, self._corpus_sharding()),
                jax.device_put(dataset.properties_normalized
                               .astype(np.float32), self._corpus_sharding()),
            )
            ARCVAETrainer._dev_arrays.pop(key, None)
            ARCVAETrainer._dev_arrays[key] = entry
            while len(ARCVAETrainer._dev_arrays) > self._DEV_CACHE_MAX:
                _, (_, t, p) = ARCVAETrainer._dev_arrays.popitem(last=False)
                for arr in (t, p):
                    if hasattr(arr, "delete"):
                        arr.delete()
        else:
            ARCVAETrainer._dev_arrays.move_to_end(key)
        return entry[1], entry[2]

    def _corpus_sharding(self):
        """Replicate the device-resident corpus across the mesh (None on a
        single device): each shard gathers its own local batch rows from a
        full copy, so index arrays — not corpus rows — cross the link."""
        if self.mesh is None:
            return None
        return replicated_sharding(self.mesh)

    def _index_batches(self, dataset, shuffle: bool):
        """Index-array counterpart of ``_batches`` (device-resident feed);
        consumes the SAME shuffle RNG, so batch composition is identical.
        When the batch axis is split over devices, partial batches are
        dropped (they cannot shard; see ``_drop_partial``)."""
        return dataset.to_index_batches(
            self.batch_size, shuffle=shuffle,
            rng=self._shuffle_rng if shuffle else None,
            drop_last=self._drop_partial)

    def _put_idx(self, idx_np):
        """Index array -> device, sharded on 'data' under a mesh (the
        leading axis is the batch for [B]; axis 1 for stacked [K, B])."""
        if self.mesh is None:
            return jnp.asarray(idx_np)
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P("data") if idx_np.ndim == 1 else P(None, "data")
        return jax.device_put(np.asarray(idx_np),
                              NamedSharding(self.mesh, spec))

    # ---------------------------------------------------------------- epoch

    def train_epoch(self, epoch: int, total_epochs: int,
                    val_dataset=None) -> Dict[str, float]:
        import time
        beta = self.compute_beta(epoch)
        teacher_forcing_ratio = self.compute_teacher_forcing_ratio(epoch, total_epochs)

        t0 = time.perf_counter()
        self._train_epoch_batches(beta, teacher_forcing_ratio)
        dt = time.perf_counter() - t0
        tokens = len(self.dataset) * self.dataset.max_length
        print(f"   Throughput: {tokens / dt:,.0f} tokens/sec "
              f"({dt:.1f}s train pass)")

        true_train_metrics = self._compute_true_train_loss(
            epoch, num_batches=self.tcfg.true_loss_batches)

        if val_dataset is not None:
            val_metrics = self._validate(val_dataset, beta)
        else:
            val_metrics = {k: 0.0 for k in ("loss", "recon", "kl", "collapse", "prop")}

        stats = self._get_latent_stats()
        mi_value = float(stats["mutual_info"])

        return {
            "train_loss": true_train_metrics["loss"],
            "train_recon": true_train_metrics["recon"],
            "train_kl": true_train_metrics["kl"],
            "train_collapse": true_train_metrics["collapse"],
            "train_prop": true_train_metrics["prop"],
            "val_loss": val_metrics.get("loss", 0.0),
            "val_recon": val_metrics.get("recon", 0.0),
            "val_kl": val_metrics.get("kl", 0.0),
            "val_collapse": val_metrics.get("collapse", 0.0),
            "val_prop": val_metrics.get("prop", 0.0),
            "beta": beta,
            "teacher_forcing": teacher_forcing_ratio,
            "mutual_info": mi_value,
        }

    # ------------------------------------------------------------ train pass

    def _train_epoch_batches(self, beta: float,
                             teacher_forcing_ratio: float) -> Dict[str, float]:
        tcfg = self.tcfg
        total_loss, num_batches = 0.0, 0
        comp_sums = dict(recon=0.0, kl=0.0, collapse=0.0, prop=0.0)
        comp_count = 0

        beta_arr = jnp.float32(beta)
        tf_arr = jnp.float32(teacher_forcing_ratio)

        num_batches_total = len(self.dataset) // self.batch_size
        feed = (self._index_batches(self.dataset, shuffle=True)
                if self._device_data
                else self._batches(self.dataset, shuffle=True))
        pbar = tqdm(feed, total=num_batches_total, desc="Training batches")

        # Lagged, async metric readback: blocking device_get per batch would
        # serialize dispatch behind the host<->device round trip (which on a
        # tunneled TPU exceeds the step time). Metrics are copied to host
        # asynchronously at dispatch and consumed LAG steps later, so the
        # dispatch stream never stalls.
        import collections
        LAG = 4
        pending = collections.deque()

        def account(batch_idx, metrics):
            nonlocal total_loss, num_batches, comp_count
            m = jax.device_get(metrics)
            loss_val = float(m["total_loss"])

            if batch_idx == 0 or batch_idx % tcfg.component_sample_every == 0:
                comp_sums["recon"] += float(m["recon_loss"])
                comp_sums["kl"] += float(m["kl_loss"])
                comp_sums["collapse"] += float(m["collapse_penalty"])
                comp_sums["prop"] += float(m["prop_loss"])
                comp_count += 1

            # Explosion guard (reference trainer.py:369-401): diagnostics +
            # skip from accounting only (the update is already applied).
            if (not np.isfinite(loss_val) or loss_val > tcfg.explosion_max
                    or loss_val < tcfg.explosion_min):
                print(f"\n⚠️  WARNING: Loss explosion detected at batch {batch_idx}!")
                print(f"   Loss: {loss_val:.2e}")
                print(f"   Components: recon={float(m['recon_loss']):.2f}, "
                      f"kl={float(m['kl_loss']):.2f}, "
                      f"weighted_kl={float(m['weighted_kl']):.2f}, "
                      f"collapse={float(m['collapse_penalty']):.2f}")
                print(f"   Latent bounds: |μ|_max={float(m['mu_abs_max']):.3f} "
                      f"(expected ≤2), logvar=[{float(m['logvar_min']):.3f}, "
                      f"{float(m['logvar_max']):.3f}] (expected [-2, 0])")
                print("   Skipping this batch...")
                return

            total_loss += loss_val
            num_batches += 1
            if batch_idx % 10 == 0 and hasattr(pbar, "set_postfix"):
                pbar.set_postfix({"loss": f"{loss_val:.4f}"})

        # K>1 dispatch fusion runs everywhere except the mesh+host-feed
        # shard_map path (its per-device local batches arrive one at a
        # time through prefetch; --host_data under a mesh is the opt-out
        # corner, kept simple at K=1).
        host_shmap = (self.mesh is not None and not self._device_data
                      and not self._gspmd)
        K = 1 if host_shmap else max(1, tcfg.steps_per_dispatch)
        chunk = []  # payloads awaiting a fused dispatch

        # Feed mode: device-resident corpus takes [B] index payloads
        # (16KB/batch over the link); host mode takes (molecules,
        # conditions) payloads.
        dev = self._device_data
        if dev:
            toks_dev, props_dev = self._dev_data(self.dataset)

        def payload_rows(p):
            return p.shape[0] if dev else p[0].shape[0]

        def one_step(p):
            if dev:
                if self._shmap_step_gather is not None:
                    return self._shmap_step_gather(
                        self.params, self.opt_states, toks_dev, props_dev,
                        self._put_idx(p), self._next_key(), beta_arr, tf_arr)
                # single-device or GSPMD (tp>1): plain jitted gather step —
                # under a mesh XLA partitions it from the input shardings.
                return train_step_gather(
                    self.params, self.opt_states, self.mcfg, tcfg,
                    toks_dev, props_dev, self._put_idx(p),
                    self._next_key(), beta_arr, tf_arr)
            m, c = p
            if self._shmap_step is not None:
                return self._shmap_step(self.params, self.opt_states, m, c,
                                        self._next_key(), beta_arr, tf_arr)
            return train_step(self.params, self.opt_states, self.mcfg, tcfg,
                              m, c, self._next_key(), beta_arr, tf_arr)

        def start_async_copy(metrics):
            for leaf in jax.tree_util.tree_leaves(metrics):
                if hasattr(leaf, "copy_to_host_async"):
                    leaf.copy_to_host_async()

        def dispatch_chunk(first_idx):
            if dev:
                idx = self._put_idx(np.stack(chunk))  # [K, B] int32
                if self._shmap_multi_gather is not None:
                    self.params, self.opt_states, metrics = \
                        self._shmap_multi_gather(
                            self.params, self.opt_states, toks_dev, props_dev,
                            idx, self._next_key(), beta_arr, tf_arr)
                else:
                    self.params, self.opt_states, metrics = \
                        multi_train_step_gather(
                            self.params, self.opt_states, self.mcfg, tcfg,
                            toks_dev, props_dev, idx,
                            self._next_key(), beta_arr, tf_arr)
            else:
                mols = np.stack([m for m, _ in chunk])
                conds = np.stack([c for _, c in chunk])
                if self._batch_sharding is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P
                    sh = NamedSharding(self.mesh, P(None, "data"))
                    mols = jax.device_put(mols, sh)
                    conds = jax.device_put(conds, sh)
                self.params, self.opt_states, metrics = multi_train_step(
                    self.params, self.opt_states, self.mcfg, tcfg,
                    mols, conds, self._next_key(), beta_arr, tf_arr)
            start_async_copy(metrics)
            pending.append((first_idx, metrics, len(chunk)))
            chunk.clear()

        def flush_pending(limit):
            while len(pending) > limit:
                first_idx, metrics, k = pending.popleft()
                if k == 1:
                    account(first_idx, metrics)
                else:
                    host = jax.device_get(metrics)
                    for j in range(k):
                        account(first_idx + j,
                                {key: v[j] for key, v in host.items()})

        batch_idx = -1
        for batch_idx, payload in enumerate(pbar):
            if K > 1 and payload_rows(payload) == self.batch_size:
                chunk.append(payload)
                if len(chunk) == K:
                    dispatch_chunk(batch_idx - K + 1)
                    flush_pending(LAG)
                continue
            # single-step path (K == 1, or a trailing partial batch)
            if chunk:  # a partial batch arrived mid-chunk: flush what we have
                if len(chunk) == 1:
                    self.params, self.opt_states, metrics = one_step(chunk[0])
                    start_async_copy(metrics)
                    pending.append((batch_idx - 1, metrics, 1))
                    chunk.clear()
                else:
                    dispatch_chunk(batch_idx - len(chunk))
            self.params, self.opt_states, metrics = one_step(payload)
            start_async_copy(metrics)
            pending.append((batch_idx, metrics, 1))
            flush_pending(LAG)

        # drain the tail: any incomplete chunk, one step at a time
        if chunk and not getattr(self, "_warned_partial_chunk", False):
            self._warned_partial_chunk = True
            print(f"\n   Note: trailing partial chunk of {len(chunk)} batch(es) "
                  f"with steps_per_dispatch={K} runs as single steps — each "
                  "distinct remainder shape compiles its own program (slow on "
                  "remote backends); size the dataset a multiple of "
                  "batch_size*K to avoid this.")
        for j, p_ in enumerate(chunk):
            self.params, self.opt_states, metrics = one_step(p_)
            start_async_copy(metrics)
            pending.append((batch_idx - len(chunk) + 1 + j, metrics, 1))
        chunk.clear()
        flush_pending(0)

        return {
            "loss": total_loss / max(1, num_batches),
            "recon": comp_sums["recon"] / comp_count if comp_count else 0.0,
            "kl": comp_sums["kl"] / comp_count if comp_count else 0.0,
            "collapse": comp_sums["collapse"] / comp_count if comp_count else 0.0,
            "prop": comp_sums["prop"] / comp_count if comp_count else 0.0,
        }

    # ------------------------------------------------------------ eval paths

    def _eval_batches(self, dataset, beta: float, max_batches: Optional[int],
                      desc: str) -> Dict[str, float]:
        sums = dict(loss=0.0, recon=0.0, kl=0.0, collapse=0.0, prop=0.0)
        if max_batches is not None and max_batches <= 0:
            # Explicitly disabled (e.g. true_loss_batches=0) — neutral
            # zeros, before any corpus upload or dispatch. Never feeds the
            # is_best comparison (validation passes max_batches=None).
            return sums
        n = 0
        beta_arr = jnp.float32(beta)
        tf_zero = jnp.float32(0.0)
        # Dispatch all eval steps first (async host copies), read back after —
        # avoids one host round trip of latency per batch.
        device_metrics = []
        dev = self._device_data
        if dev:
            toks_dev, props_dev = self._dev_data(dataset)
            feed = self._index_batches(dataset, shuffle=False)
        else:
            feed = self._batches(dataset, shuffle=False)
        for batch_idx, payload in enumerate(feed):
            if max_batches is not None and batch_idx >= max_batches:
                break
            if dev:
                if self._shmap_eval_gather is not None:
                    m = self._shmap_eval_gather(self.params, toks_dev,
                                                props_dev,
                                                self._put_idx(payload),
                                                self._next_key(), beta_arr,
                                                tf_zero)
                else:
                    m = eval_step_gather(self.params, self.mcfg, self.tcfg,
                                         toks_dev, props_dev,
                                         self._put_idx(payload),
                                         self._next_key(),
                                         beta_arr, tf_zero)
            elif self._shmap_eval is not None:
                molecules, conditions = payload
                m = self._shmap_eval(self.params, molecules, conditions,
                                     self._next_key(), beta_arr, tf_zero)
            else:
                molecules, conditions = payload
                m = eval_step(self.params, self.mcfg, self.tcfg,
                              molecules, conditions, self._next_key(),
                              beta_arr, tf_zero)
            for leaf in jax.tree_util.tree_leaves(m):
                if hasattr(leaf, "copy_to_host_async"):
                    leaf.copy_to_host_async()
            device_metrics.append(m)
        for m in device_metrics:
            m = jax.device_get(m)
            sums["loss"] += float(m["total_loss"])
            sums["recon"] += float(m["recon_loss"])
            sums["kl"] += float(m["kl_loss"])
            sums["collapse"] += float(m["collapse_penalty"])
            sums["prop"] += float(m["prop_loss"])
            n += 1
        if n == 0 and len(dataset) > 0:
            # No full batch fit the mesh (partial batches cannot shard).
            # Report +inf for EVERY metric, NOT 0.0: all of them are
            # --best_metric candidates (minimized), and a zero value would
            # win the is_best comparison and freeze checkpoint_best on
            # untrained weights (code-review r3).
            print(f"   ⚠️  {desc}: dataset has {len(dataset)} samples < "
                  f"batch_size {self.batch_size}; partial batches cannot "
                  "shard over the mesh — metrics report +inf so they can "
                  "never be selected as best (shrink batch_size or grow "
                  "the split; under a mesh trailing partial batches are "
                  "likewise dropped from eval metrics)")
            return {k: float("inf") for k in sums}
        return {k: v / n if n else 0.0 for k, v in sums.items()}

    def _compute_true_train_loss(self, epoch: int,
                                 num_batches: int = 20) -> Dict[str, float]:
        """No-TF train loss on the first ``num_batches`` unshuffled batches
        (reference ``trainer.py:116-175``)."""
        beta = self.compute_beta(epoch)
        return self._eval_batches(self.dataset, beta, num_batches, "True loss")

    def _validate(self, val_dataset, beta: float) -> Dict[str, float]:
        return self._eval_batches(val_dataset, beta, None, "Validating")

    def _get_latent_stats(self) -> Dict[str, float]:
        """Latent stats + monitor-MI on one 64-batch (reference
        ``trainer.py:524-575``); datasets smaller than 64 use one
        full-dataset batch instead of a partial one."""
        monitor_bs = min(64, len(self.dataset))
        if monitor_bs == 0:
            return {k: 0.0 for k in
                    ("mu_min", "mu_max", "mu_mean", "mu_std", "logvar_min",
                     "logvar_max", "logvar_mean", "logvar_std", "mutual_info")}
        molecules, conditions = next(iter(
            self.dataset.to_batches(monitor_bs, shuffle=False)))
        stats = jax.device_get(monitor_step(
            self.params["encoder"], self.mcfg,
            jnp.asarray(molecules), jnp.asarray(conditions)))
        stats = {k: float(v) for k, v in stats.items()}
        print(f"   Latent Stats: μ=[{stats['mu_min']:.3f}, {stats['mu_max']:.3f}] "
              f"(mean={stats['mu_mean']:.3f}, std={stats['mu_std']:.3f}), "
              f"logvar=[{stats['logvar_min']:.3f}, {stats['logvar_max']:.3f}] "
              f"(mean={stats['logvar_mean']:.3f}, std={stats['logvar_std']:.3f})")
        return stats

    # ---------------------------------------------------------- persistence

    def save_checkpoint(self, epoch: int, is_best: bool = False,
                        best_val_loss: float = float("inf")) -> None:
        """Write ``checkpoint_epoch_{epoch:03d}.npz`` (+ ``checkpoint_best``
        when ``is_best``) — the reference's surface
        (``/root/reference/trainer.py:577-603``) with two TPU-era fixes:

        * the device→host fetch and npz serialization happen ONCE and the
          best file is a byte copy (the reference fetches and re-pickles the
          whole state per file);
        * with ``TrainConfig.async_checkpoint`` (default) the fetch+write
          runs on a background thread while the next epoch trains — through
          the tunneled host link a scaled-config state is ~2 minutes of
          transfer (66.7M params + Adam state, measured) that would
          otherwise stall the step loop once per improving epoch. Holding
          Python references is NOT enough to keep the source buffers alive:
          the train steps donate ``params``/``opt_states``
          (``train/steps.py``), so the next epoch's first step deletes the
          snapshot's device buffers under the in-flight fetch (observed on
          TPU as ``Array has been deleted``). The snapshot is therefore an
          on-device COPY — one jitted tree-identity per save, a pure
          HBM-bandwidth op dispatched asynchronously — whose fresh,
          never-donated buffers the background thread fetches at leisure.
          The history lists are shallow-copied for the same reason. At most
          one save is in flight (`join_saves`), and the CLI joins before
          anything re-reads a checkpoint.

          **Memory cost**: the on-device snapshot roughly DOUBLES the HBM
          residency of params+opt-states until the background fetch lands
          (~2 min through the relay at the scaled config), overlapping the
          next epoch's step buffers. Model state is small relative to
          activations here (scaled config: ~0.8 GB state vs 16 GB HBM), but
          on memory-tight configs pass ``--sync_checkpoint`` to trade the
          stall for zero extra residency. (ADVICE r3; also documented in
          docs/DESIGN.md "Checkpointing".)
        """
        self.join_saves()
        path = self.checkpoint_dir / f"checkpoint_epoch_{epoch:03d}.npz"
        data_stats = {
            "properties_mean": getattr(self.dataset, "properties_mean", None),
            "properties_std": getattr(self.dataset, "properties_std", None),
            "alphabet": self.alphabet,
        }
        params, opt_states = self.params, self.opt_states
        if self.tcfg.async_checkpoint:
            params = _device_copy(params)
            opt_states = _device_copy(opt_states)
        history = {k: list(v) for k, v in self.history.items()}

        def work():
            host = ckpt_io.build_checkpoint_host(
                epoch, params, opt_states, history, best_val_loss,
                data_stats=data_stats)
            ckpt_io.write_checkpoint(path, host)
            lines = []
            if is_best:
                best = self.checkpoint_dir / "checkpoint_best.npz"
                tmp = best.with_name(f"{best.name}.tmp.{os.getpid()}")
                try:
                    shutil.copyfile(path, tmp)
                    os.replace(tmp, best)
                finally:
                    tmp.unlink(missing_ok=True)
                lines.append(f"    Saved checkpoint: {best}")
            lines.append(f"    Saved checkpoint: {path}")
            print("\n".join(lines))

        if self.tcfg.async_checkpoint:
            t = threading.Thread(target=self._run_save, args=(work,),
                                 name=f"ckpt-save-epoch-{epoch}", daemon=True)
            self._save_thread = t
            t.start()
        else:
            work()

    def _run_save(self, work) -> None:
        try:
            work()
        except BaseException as e:  # surfaced at the next join point
            self._save_error = e

    def join_saves(self) -> None:
        """Block until any in-flight async checkpoint save has landed;
        re-raise a failed save's exception (a silently lost checkpoint must
        not look like a saved one)."""
        t = self._save_thread
        if t is not None:
            t.join()
            self._save_thread = None
        err, self._save_error = self._save_error, None
        if err is not None:
            raise RuntimeError("async checkpoint save failed") from err

    def load_checkpoint(self, checkpoint_path) -> int:
        self.join_saves()
        loaded = ckpt_io.load_checkpoint(checkpoint_path)
        # Keep predictor params if the checkpoint lacks them but we have them.
        for name, p in loaded["params"].items():
            self.params[name] = p
        for name, s in loaded["opt_states"].items():
            self.opt_states[name] = s
        if self.mesh is not None:
            self.params = shard_params(self.mesh, self.params,
                                       model_parallel=self._gspmd)
            self.opt_states = shard_params(self.mesh, self.opt_states,
                                           model_parallel=self._gspmd)
        if loaded["history"] is not None:
            self.history = loaded["history"]
        return loaded["epoch"]

    def save_history(self, path) -> None:
        save_history(self.history, path)

    def plot_history(self, save_path=None) -> None:
        plot_history(self.history, save_path)
