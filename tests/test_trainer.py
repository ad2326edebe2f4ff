import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_vae_tpu.config import ModelConfig, TrainConfig
from mlx_vae_tpu.data import MoleculeDataset
from mlx_vae_tpu.data.prepare import make_synthetic_dataset
from mlx_vae_tpu.data.split import load_and_split
from mlx_vae_tpu.models import ARCVAE
from mlx_vae_tpu.train import ARCVAETrainer, load_checkpoint
from mlx_vae_tpu.train.optim import adam_init, adam_update, clip_by_global_norm


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("train")
    data_path = tmp / "syn.json"
    make_synthetic_dataset(n=220, vocab_size=24, max_length=16, path=str(data_path))
    train_ds, val_ds, _, _ = load_and_split(str(data_path))
    mcfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=32,
                       latent_dim=8, num_conditions=1, num_layers=2)
    return tmp, train_ds, val_ds, mcfg


class TestSchedules:
    def test_beta_anneal(self):
        t = TrainConfig(beta_start=0.0, beta_end=0.05, beta_warmup_epochs=20)
        assert t.compute_beta(0) == 0.0
        assert abs(t.compute_beta(10) - 0.025) < 1e-9
        assert t.compute_beta(20) == 0.05
        assert t.compute_beta(100) == 0.05

    def test_tf_decay(self):
        t = TrainConfig()
        assert t.compute_teacher_forcing_ratio(0, 30) == 0.9
        assert abs(t.compute_teacher_forcing_ratio(15, 30) - 0.7) < 1e-9
        assert t.compute_teacher_forcing_ratio(30, 30) == 0.5  # floor


class TestOptim:
    def test_adam_mlx_parity_no_bias_correction(self):
        """First MLX-style Adam step: p -= lr * m/(sqrt(v)+eps) with
        m=(1-b1)g, v=(1-b2)g^2 — no warmup scaling."""
        p = {"w": jnp.asarray([1.0])}
        g = {"w": jnp.asarray([0.5])}
        st = adam_init(p)
        newp, _ = adam_update(p, g, st, lr=0.1, bias_correction=False)
        m = 0.1 * 0.5
        v = 0.001 * 0.25
        expected = 1.0 - 0.1 * m / (np.sqrt(v) + 1e-8)
        assert abs(float(newp["w"][0]) - expected) < 1e-6

    def test_adam_bias_correction(self):
        p = {"w": jnp.asarray([1.0])}
        g = {"w": jnp.asarray([0.5])}
        st = adam_init(p)
        newp, _ = adam_update(p, g, st, lr=0.1, bias_correction=True)
        # first corrected step is ~ -lr * sign(g)
        assert abs(float(newp["w"][0]) - (1.0 - 0.1)) < 1e-3

    def test_clip_by_global_norm(self):
        g1 = {"a": jnp.asarray([3.0])}
        g2 = {"b": jnp.asarray([4.0])}
        (c1, c2), norm = clip_by_global_norm((g1, g2), 1.0)
        assert abs(float(norm) - 5.0) < 1e-6
        clipped_norm = np.sqrt(float(c1["a"][0]) ** 2 + float(c2["b"][0]) ** 2)
        assert abs(clipped_norm - 1.0) < 1e-4
        # under the threshold: untouched
        (c1, _), _ = clip_by_global_norm((g1, g2), 100.0)
        assert float(c1["a"][0]) == 3.0


class TestTrainerE2E:
    def test_loss_decreases_and_history(self, tiny_setup):
        tmp, train_ds, val_ds, mcfg = tiny_setup
        tcfg = TrainConfig(epochs=3, batch_size=32, learning_rate=3e-3,
                           checkpoint_dir=str(tmp / "ckpt"), true_loss_batches=3)
        vae = ARCVAE(mcfg, jax.random.PRNGKey(0))
        trainer = ARCVAETrainer(vae.params, mcfg, tcfg, train_ds)
        losses = []
        for epoch in range(3):
            m = trainer.train_epoch(epoch, 3, val_dataset=val_ds)
            losses.append(m["train_loss"])
            assert np.isfinite(m["val_loss"])
            for k in ("train_recon", "train_kl", "val_recon", "beta",
                      "teacher_forcing", "mutual_info"):
                assert k in m
        assert losses[-1] < losses[0], f"loss did not decrease: {losses}"

    def test_true_loss_batches_zero_reports_neutral_zero(self, tiny_setup):
        """``true_loss_batches=0`` disables the no-TF estimate; it must
        report 0.0 (as before r3) — not +inf with a bogus mesh-sharding
        diagnosis on a single device (code-review r3). The +inf sentinel
        is reserved for the mesh dropping every partial batch."""
        tmp, train_ds, val_ds, mcfg = tiny_setup
        tcfg = TrainConfig(epochs=1, batch_size=32, learning_rate=3e-3,
                           checkpoint_dir=str(tmp / "ckpt0"),
                           true_loss_batches=0)
        vae = ARCVAE(mcfg, jax.random.PRNGKey(0))
        trainer = ARCVAETrainer(vae.params, mcfg, tcfg, train_ds)
        m = trainer.train_epoch(0, 1, val_dataset=val_ds)
        assert m["train_loss"] == 0.0
        assert np.isfinite(m["val_loss"])

    def test_checkpoint_roundtrip_bit_exact(self, tiny_setup):
        tmp, train_ds, val_ds, mcfg = tiny_setup
        ckpt_dir = tmp / "ckpt2"
        tcfg = TrainConfig(epochs=1, batch_size=32, checkpoint_dir=str(ckpt_dir),
                           true_loss_batches=2)
        vae = ARCVAE(mcfg, jax.random.PRNGKey(1))
        trainer = ARCVAETrainer(vae.params, mcfg, tcfg, train_ds)
        trainer.train_epoch(0, 1, val_dataset=None)
        trainer.history["epoch"].append(0)
        trainer.save_checkpoint(epoch=0, is_best=True, best_val_loss=1.23)
        trainer.join_saves()

        # key contract (SURVEY.md §3.4)
        raw = np.load(ckpt_dir / "checkpoint_best.npz", allow_pickle=True)
        for k in ("epoch", "encoder_weights", "decoder_weights",
                  "encoder_optimizer_state", "decoder_optimizer_state",
                  "history", "best_val_loss"):
            assert k in raw, f"missing checkpoint key {k}"

        # bit-exact restore into a fresh trainer
        vae2 = ARCVAE(mcfg, jax.random.PRNGKey(99))
        trainer2 = ARCVAETrainer(vae2.params, mcfg, tcfg, train_ds)
        epoch = trainer2.load_checkpoint(ckpt_dir / "checkpoint_best.npz")
        assert epoch == 0
        for (p1, p2) in zip(jax.tree_util.tree_leaves(trainer.params),
                            jax.tree_util.tree_leaves(trainer2.params)):
            np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        for (s1, s2) in zip(jax.tree_util.tree_leaves(trainer.opt_states),
                            jax.tree_util.tree_leaves(trainer2.opt_states)):
            np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        assert trainer2.history["epoch"] == [0]

    def test_checkpoint_embeds_data_stats(self, tiny_setup):
        """Checkpoints carry properties_mean/std + alphabet so generation is
        self-contained (ADVICE r1)."""
        tmp, train_ds, _, mcfg = tiny_setup
        ckpt_dir = tmp / "ckpt_stats"
        tcfg = TrainConfig(checkpoint_dir=str(ckpt_dir))
        vae = ARCVAE(mcfg, jax.random.PRNGKey(5))
        trainer = ARCVAETrainer(vae.params, mcfg, tcfg, train_ds)
        trainer.alphabet = ["[PAD]", "[SOS]", "[EOS]", "[C]"]
        trainer.save_checkpoint(0, is_best=True)
        trainer.join_saves()
        from mlx_vae_tpu.train.checkpoint import load_checkpoint
        loaded = load_checkpoint(ckpt_dir / "checkpoint_best.npz")
        st = loaded["data_stats"]
        np.testing.assert_allclose(st["properties_mean"],
                                   train_ds.properties_mean)
        np.testing.assert_allclose(st["properties_std"],
                                   train_ds.properties_std)
        assert st["alphabet"] == ["[PAD]", "[SOS]", "[EOS]", "[C]"]

    def test_latent_stats_small_dataset(self, tiny_setup):
        """_get_latent_stats with a dataset smaller than the reference's
        64-batch must use one full-dataset batch (VERDICT r1 weak #7)."""
        from mlx_vae_tpu.data import MoleculeDataset
        tmp, train_ds, _, mcfg = tiny_setup
        rng = np.random.default_rng(0)
        small = MoleculeDataset(
            [list(rng.integers(1, mcfg.vocab_size, 10)) for _ in range(7)],
            rng.normal(size=(7, 1)), max_length=12)
        tcfg = TrainConfig(checkpoint_dir=str(tmp / "ckpt_small"))
        vae = ARCVAE(mcfg, jax.random.PRNGKey(6))
        trainer = ARCVAETrainer(vae.params, mcfg, tcfg, small)
        stats = trainer._get_latent_stats()
        assert np.isfinite(stats["mutual_info"])
        assert -2.0 <= stats["mu_min"] <= stats["mu_max"] <= 2.0

    def test_history_json_schema(self, tiny_setup):
        tmp, train_ds, _, mcfg = tiny_setup
        tcfg = TrainConfig(checkpoint_dir=str(tmp / "ckpt3"))
        vae = ARCVAE(mcfg, jax.random.PRNGKey(2))
        trainer = ARCVAETrainer(vae.params, mcfg, tcfg, train_ds)
        trainer.save_history(str(tmp))
        with open(tmp / "training_history.json") as f:
            h = json.load(f)
        assert set(h) == {
            "epoch", "train_loss", "train_recon", "train_kl", "train_collapse",
            "train_prop", "val_loss", "val_recon", "val_kl", "val_collapse",
            "val_prop", "beta", "teacher_forcing", "learning_rate", "mutual_info",
        }

    def test_plot_written(self, tiny_setup):
        tmp, train_ds, _, mcfg = tiny_setup
        tcfg = TrainConfig(checkpoint_dir=str(tmp / "ckpt4"))
        vae = ARCVAE(mcfg, jax.random.PRNGKey(3))
        trainer = ARCVAETrainer(vae.params, mcfg, tcfg, train_ds)
        for i in range(2):
            trainer.history["epoch"].append(i)
            for k in trainer.history:
                if k != "epoch":
                    trainer.history[k].append(float(i))
        out = tmp / "hist.png"
        trainer.plot_history(save_path=str(out))
        assert out.exists() and out.stat().st_size > 1000

    def test_predictor_training(self, tiny_setup):
        tmp, train_ds, _, mcfg = tiny_setup
        tcfg = TrainConfig(epochs=1, batch_size=32, true_loss_batches=2,
                           checkpoint_dir=str(tmp / "ckpt5"))
        vae = ARCVAE(mcfg, jax.random.PRNGKey(4), with_predictor=True)
        trainer = ARCVAETrainer(vae.params, mcfg, tcfg, train_ds)
        m = trainer.train_epoch(0, 1, val_dataset=None)
        assert m["train_prop"] > 0.0
        # predictor weights must be in checkpoints
        trainer.save_checkpoint(0, is_best=True)
        trainer.join_saves()
        raw = np.load(Path(tcfg.checkpoint_dir) / "checkpoint_best.npz",
                      allow_pickle=True)
        assert "predictor_weights" in raw


class TestStepsPerDispatch:
    @pytest.mark.slow
    def test_fused_dispatch_matches_accounting(self, tiny_setup):
        """K>1 path: every batch is accounted exactly once, training works,
        and the trailing partial chunk + partial batch are handled."""
        tmp, train_ds, val_ds, mcfg = tiny_setup
        # 176 train molecules -> 5 full batches of 32 + partial 16:
        # chunks of K=2 -> 2 fused dispatches + 1 single + partial single
        tcfg = TrainConfig(epochs=1, batch_size=32, learning_rate=3e-3,
                           checkpoint_dir=str(tmp / "ck_spd"),
                           true_loss_batches=2, steps_per_dispatch=2)
        vae = ARCVAE(mcfg, jax.random.PRNGKey(5))
        trainer = ARCVAETrainer(vae.params, mcfg, tcfg, train_ds)
        m = trainer.train_epoch(0, 1, val_dataset=val_ds)
        assert np.isfinite(m["train_loss"]) and np.isfinite(m["val_loss"])

    @pytest.mark.slow
    def test_device_feed_matches_host_feed(self, tiny_setup):
        """The device-resident index feed must be numerically IDENTICAL to
        host batching: same shuffle-RNG consumption -> same batch
        composition, and the on-device gather + uint8 widen change no
        values. Bit-equal train losses over 2 epochs."""
        tmp, train_ds, val_ds, mcfg = tiny_setup
        results = {}
        for host in (False, True):
            tcfg = TrainConfig(epochs=2, batch_size=32, learning_rate=3e-3,
                               checkpoint_dir=str(tmp / f"ck_hd{int(host)}"),
                               true_loss_batches=3, host_data=host)
            vae = ARCVAE(mcfg, jax.random.PRNGKey(11))
            trainer = ARCVAETrainer(vae.params, mcfg, tcfg, train_ds)
            assert trainer._device_data is (not host)
            ms = [trainer.train_epoch(e, 2, val_dataset=val_ds)
                  for e in range(2)]
            results[host] = [(m["train_loss"], m["val_loss"]) for m in ms]
        assert results[False] == results[True]

    @pytest.mark.slow
    def test_k1_and_k4_train_similarly(self, tiny_setup):
        tmp, train_ds, _, mcfg = tiny_setup
        losses = {}
        for k in (1, 4):
            tcfg = TrainConfig(epochs=2, batch_size=32, learning_rate=3e-3,
                               checkpoint_dir=str(tmp / f"ck_k{k}"),
                               true_loss_batches=3, steps_per_dispatch=k)
            vae = ARCVAE(mcfg, jax.random.PRNGKey(7))
            trainer = ARCVAETrainer(vae.params, mcfg, tcfg, train_ds)
            trainer.train_epoch(0, 2, val_dataset=None)
            losses[k] = trainer.train_epoch(1, 2, val_dataset=None)["train_loss"]
        # same data, same init, same schedule; only PRNG batching differs
        assert abs(losses[1] - losses[4]) / losses[1] < 0.2

    @pytest.mark.slow
    def test_same_seed_reproduces_bitwise(self, tiny_setup):
        """Trajectories are deterministic per (seed, steps_per_dispatch):
        two fresh trainers with identical configs must produce bit-equal
        epoch metrics — the claim examples/README.md makes of the committed
        30-epoch artifact. (Different K consumes the PRNG differently and
        lands on a different — equally valid — trajectory, covered by
        ``test_k1_and_k4_train_similarly``.)"""
        tmp, train_ds, val_ds, mcfg = tiny_setup
        for k in (1, 2):
            runs = []
            for rep in range(2):
                tcfg = TrainConfig(epochs=2, batch_size=32,
                                   learning_rate=3e-3,
                                   checkpoint_dir=str(tmp / f"ck_det{k}{rep}"),
                                   true_loss_batches=3, steps_per_dispatch=k)
                vae = ARCVAE(mcfg, jax.random.PRNGKey(13))
                trainer = ARCVAETrainer(vae.params, mcfg, tcfg, train_ds)
                ms = [trainer.train_epoch(e, 2, val_dataset=val_ds)
                      for e in range(2)]
                runs.append([(m["train_loss"], m["val_loss"]) for m in ms])
            assert runs[0] == runs[1]  # bit-equal, not approx


class TestAsyncCheckpoint:
    """The async checkpoint writer (TrainConfig.async_checkpoint, default on)
    must be invisible except for timing: same bytes, same key contract, a
    snapshot immune to later history mutation, and loud failures."""

    def _trainer(self, tiny_setup, name, **tcfg_kw):
        tmp, train_ds, _, mcfg = tiny_setup
        tcfg = TrainConfig(epochs=1, batch_size=32,
                           checkpoint_dir=str(tmp / name), **tcfg_kw)
        vae = ARCVAE(mcfg, jax.random.PRNGKey(7))
        return ARCVAETrainer(vae.params, mcfg, tcfg, train_ds), tmp / name

    def test_async_matches_sync_bytes(self, tiny_setup):
        tr_a, dir_a = self._trainer(tiny_setup, "ck_async",
                                    async_checkpoint=True)
        tr_s, dir_s = self._trainer(tiny_setup, "ck_sync",
                                    async_checkpoint=False)
        for tr in (tr_a, tr_s):
            tr.history["epoch"].append(0)
            tr.save_checkpoint(epoch=0, is_best=True, best_val_loss=2.5)
            tr.join_saves()
        a = (dir_a / "checkpoint_epoch_000.npz").read_bytes()
        s = (dir_s / "checkpoint_epoch_000.npz").read_bytes()
        assert a == s  # identical PRNG seed -> identical params -> same file
        # the best file is a byte copy of the epoch file (single serialize)
        assert a == (dir_a / "checkpoint_best.npz").read_bytes()

    def test_snapshot_immune_to_history_mutation(self, tiny_setup):
        trainer, d = self._trainer(tiny_setup, "ck_snap")
        trainer.history["epoch"].append(0)
        trainer.save_checkpoint(epoch=0, is_best=False)
        # mutate AFTER the save call returns but (possibly) before the
        # background write lands — the saved file must hold the snapshot
        trainer.history["epoch"].append(999)
        trainer.join_saves()
        raw = np.load(d / "checkpoint_epoch_000.npz", allow_pickle=True)
        assert raw["history"].item()["epoch"] == [0]

    def test_failed_save_raises_at_join(self, tiny_setup, monkeypatch):
        trainer, _ = self._trainer(tiny_setup, "ck_fail")
        from mlx_vae_tpu.train import checkpoint as ckpt_io

        def boom(*a, **kw):
            raise OSError("disk full")

        monkeypatch.setattr(ckpt_io, "write_checkpoint", boom)
        trainer.save_checkpoint(epoch=0)
        with pytest.raises(RuntimeError, match="async checkpoint save"):
            trainer.join_saves()
        # and the error is cleared once surfaced
        trainer.join_saves()

    def test_atomic_write_leaves_no_tmp(self, tiny_setup):
        trainer, d = self._trainer(tiny_setup, "ck_tmpclean")
        trainer.save_checkpoint(epoch=0, is_best=True)
        trainer.join_saves()
        leftovers = [p.name for p in d.iterdir() if ".tmp." in p.name]
        assert leftovers == []

    def test_save_survives_donation_by_next_epoch(self, tiny_setup, monkeypatch):
        """The train steps donate params/opt_states, so the next epoch
        DELETES the buffers an in-flight async save would be fetching
        (observed on TPU as 'Array has been deleted'). The on-device
        snapshot copy must make the save immune — and the file must hold
        the values at save time, not post-epoch-2 ones."""
        import time as _time
        from mlx_vae_tpu.train import checkpoint as ckpt_io

        trainer, d = self._trainer(tiny_setup, "ck_donate",
                                   learning_rate=3e-3, true_loss_batches=2)
        trainer.train_epoch(0, 2, val_dataset=None)
        at_save = jax.device_get(trainer.params["decoder"]["fc_out"]["weight"])

        real = ckpt_io.build_checkpoint_host

        def slow_build(*a, **kw):  # hold the fetch open across the epoch
            _time.sleep(0.5)
            return real(*a, **kw)

        monkeypatch.setattr(ckpt_io, "build_checkpoint_host", slow_build)
        trainer.save_checkpoint(0, is_best=True)
        trainer.train_epoch(1, 2, val_dataset=None)  # donates old buffers
        trainer.join_saves()

        loaded = load_checkpoint(d / "checkpoint_best.npz")
        np.testing.assert_array_equal(
            np.asarray(loaded["params"]["decoder"]["fc_out"]["weight"]),
            at_save)
        # and training genuinely moved on past the snapshot
        after = jax.device_get(trainer.params["decoder"]["fc_out"]["weight"])
        assert not np.array_equal(after, at_save)
