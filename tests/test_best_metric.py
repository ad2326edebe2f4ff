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
