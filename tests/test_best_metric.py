"""``--best_metric`` checkpoint selection (``cli/train.py``).

Scripts the per-epoch metrics (monkeypatched ``train_epoch``) so the two
series disagree about which epoch is best — the measured real-world shape
(benchmarks/reconstruction_eval.json "gotcha"): under an annealing beta,
total val loss favors EARLY low-beta epochs while val_recon keeps
improving. Asserts which epochs get saved as best under each flag value.
"""

import jax
import numpy as np
import pytest

from mlx_vae_tpu.data.prepare import make_synthetic_dataset
from mlx_vae_tpu.train.trainer import ARCVAETrainer

# Epoch:       0     1     2
# val_loss:   2.0   2.5   3.0   (total incl. beta*KL — rises with beta)
# val_recon:  3.0   2.5   2.0   (keeps improving)
_SCRIPT = {
    "val_loss": [2.0, 2.5, 3.0],
    "val_recon": [3.0, 2.5, 2.0],
}


def _scripted_metrics(epoch):
    m = {k: 0.0 for k in ("train_loss", "train_recon", "train_kl",
                          "train_collapse", "train_prop", "val_kl",
                          "val_collapse", "val_prop", "beta",
                          "teacher_forcing", "mutual_info")}
    m["val_loss"] = _SCRIPT["val_loss"][epoch]
    m["val_recon"] = _SCRIPT["val_recon"][epoch]
    return m


def _run(tmp_path, monkeypatch, best_metric):
    from mlx_vae_tpu.cli.train import main

    best_epochs = []

    def fake_train_epoch(self, epoch, total_epochs, val_dataset=None):
        return _scripted_metrics(epoch)

    real_save = ARCVAETrainer.save_checkpoint

    def spy_save(self, epoch, is_best, **kw):
        if is_best:
            best_epochs.append(epoch)
        return real_save(self, epoch, is_best=is_best, **kw)

    monkeypatch.setattr(ARCVAETrainer, "train_epoch", fake_train_epoch)
    monkeypatch.setattr(ARCVAETrainer, "save_checkpoint", spy_save)

    d = tmp_path / "d.json"
    make_synthetic_dataset(n=60, vocab_size=24, max_length=12, seed=0,
                           path=str(d))
    main(["--data", str(d), "--vocab_size", "24", "--embedding_dim", "8",
          "--hidden_dim", "16", "--latent_dim", "4", "--num_layers", "1",
          "--epochs", "3", "--batch_size", "16",
          "--checkpoint_dir", str(tmp_path / f"ck_{best_metric}"),
          "--checkpoint_freq", "100", "--best_metric", best_metric])
    return best_epochs


def test_default_reference_semantics_picks_early_epoch(tmp_path, monkeypatch):
    """val_loss (reference semantics): only epoch 0 improves."""
    assert _run(tmp_path, monkeypatch, "val_loss") == [0]


def test_val_recon_tracks_the_improving_series(tmp_path, monkeypatch):
    """val_recon: every epoch improves -> best saved each time."""
    assert _run(tmp_path, monkeypatch, "val_recon") == [0, 1, 2]


def test_rejects_unknown_metric(tmp_path):
    from mlx_vae_tpu.cli.train import main
    with pytest.raises(SystemExit):
        main(["--data", "x.json", "--best_metric", "val_banana"])


# --- pre-anneal best-checkpoint warnings (the conditioning-strength-study
#     artifact: benchmarks/conditioning_strength_study.json B_best/B_final) ---

def _hist(val_loss, beta):
    return {"val_loss": list(val_loss), "beta": list(beta)}


class TestAnnealBestWarning:
    def test_warns_when_best_is_pre_anneal(self):
        from mlx_vae_tpu.train.history import anneal_best_warning
        # arm-B shape: val_loss minimum at epoch 0 while beta ramps 0->0.2
        h = _hist([0.9, 1.0, 1.1, 1.2], [0.0, 0.07, 0.13, 0.2])
        msg = anneal_best_warning(h, "val_loss")
        assert msg is not None and "epoch 0" in msg

    def test_quiet_when_best_is_post_anneal(self):
        from mlx_vae_tpu.train.history import anneal_best_warning
        # arm-A shape: best near the end, beta nearly final there
        h = _hist([2.0, 1.5, 1.2, 1.3], [0.0, 0.02, 0.045, 0.05])
        assert anneal_best_warning(h, "val_loss") is None

    def test_quiet_without_annealing(self):
        from mlx_vae_tpu.train.history import anneal_best_warning
        h = _hist([2.0, 1.0, 1.5], [0.0, 0.0, 0.0])
        assert anneal_best_warning(h, "val_loss") is None

    def test_quiet_for_val_recon(self):
        from mlx_vae_tpu.train.history import anneal_best_warning
        h = _hist([0.9, 1.0, 1.1], [0.0, 0.1, 0.2])
        assert anneal_best_warning(h, "val_recon") is None

    def test_quiet_when_best_is_last_epoch(self):
        from mlx_vae_tpu.train.history import anneal_best_warning
        h = _hist([2.0, 1.5, 1.0], [0.0, 0.1, 0.2])
        assert anneal_best_warning(h, "val_loss") is None


class TestStaleBestNotice:
    def _dir(self, tmp_path, best_epoch, sibling_epochs):
        np.savez(tmp_path / "checkpoint_best.npz", epoch=best_epoch)
        for e in sibling_epochs:
            (tmp_path / f"checkpoint_epoch_{e:03d}.npz").write_bytes(b"")
        return tmp_path / "checkpoint_best.npz"

    def test_notices_epoch0_best_of_long_run(self, tmp_path):
        from mlx_vae_tpu.train.checkpoint import stale_best_notice
        p = self._dir(tmp_path, 0, [9, 19, 29, 39, 49])
        msg = stale_best_notice(p, 0)
        assert msg is not None and "epoch 49" in msg

    def test_quiet_when_best_is_near_final(self, tmp_path):
        from mlx_vae_tpu.train.checkpoint import stale_best_notice
        p = self._dir(tmp_path, 44, [9, 19, 29, 39, 49])
        assert stale_best_notice(p, 44) is None

    def test_quiet_without_siblings(self, tmp_path):
        from mlx_vae_tpu.train.checkpoint import stale_best_notice
        np.savez(tmp_path / "checkpoint_best.npz", epoch=0)
        assert stale_best_notice(tmp_path / "checkpoint_best.npz", 0) is None

    def test_quiet_for_non_best_filenames(self, tmp_path):
        from mlx_vae_tpu.train.checkpoint import stale_best_notice
        self._dir(tmp_path, 0, [49])
        assert stale_best_notice(
            tmp_path / "checkpoint_epoch_000.npz", 0) is None

    def test_load_checkpoint_prints_notice(self, tmp_path, capsys):
        from mlx_vae_tpu.train.checkpoint import load_checkpoint
        p = self._dir(tmp_path, 0, [9, 19, 29, 39, 49])
        load_checkpoint(p)
        err = capsys.readouterr().err
        assert "sibling checkpoints" in err and "epoch 49" in err
