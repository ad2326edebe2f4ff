"""End-to-end CLI tests (in-process, tiny configs, CPU)."""

import json
from pathlib import Path

import numpy as np
import pytest


def test_train_cli_end_to_end(tmp_path, monkeypatch):
    from mlx_vae_tpu.cli.train import main
    monkeypatch.chdir(tmp_path)
    main([
        "--data", str(tmp_path / "d.json"), "--synthetic", "300",
        "--vocab_size", "24", "--embedding_dim", "16", "--hidden_dim", "32",
        "--latent_dim", "8", "--num_layers", "2",
        "--epochs", "2", "--batch_size", "32", "--learning_rate", "3e-3",
        "--checkpoint_dir", str(tmp_path / "ck"), "--checkpoint_freq", "1",
        "--verbose",
    ])
    ck = tmp_path / "ck"
    assert (ck / "checkpoint_best.npz").exists()
    assert (ck / "training_history.json").exists()
    assert (ck / "training_history.png").exists()
    with open(ck / "training_history.json") as f:
        h = json.load(f)
    assert len(h["epoch"]) == 2
    assert all(np.isfinite(v) for v in h["train_loss"])

    # --resume continues from the best checkpoint
    main([
        "--data", str(tmp_path / "d.json"),
        "--vocab_size", "24", "--embedding_dim", "16", "--hidden_dim", "32",
        "--latent_dim", "8", "--num_layers", "2",
        "--epochs", "3", "--batch_size", "32",
        "--checkpoint_dir", str(ck), "--checkpoint_freq", "1", "--resume",
    ])
    with open(ck / "training_history.json") as f:
        h = json.load(f)
    assert len(h["epoch"]) >= 3


def test_generate_cli_end_to_end(tmp_path, monkeypatch):
    from mlx_vae_tpu.cli.train import main as train_main
    from mlx_vae_tpu.cli.generate import main as gen_main
    monkeypatch.chdir(tmp_path)
    train_main([
        "--data", str(tmp_path / "d.json"), "--synthetic", "200",
        "--vocab_size", "24", "--embedding_dim", "16", "--hidden_dim", "32",
        "--latent_dim", "8", "--num_layers", "2",
        "--epochs", "1", "--batch_size", "32",
        "--checkpoint_dir", str(tmp_path / "ck"), "--checkpoint_freq", "1",
    ])
    out = tmp_path / "gen.json"
    gen_main([
        "--checkpoint", str(tmp_path / "ck" / "checkpoint_best.npz"),
        "--data", str(tmp_path / "d.json"),
        "--num_molecules", "64", "--batch_size", "32", "--max_length", "16",
        "--temperature", "0.8", "--target", "60",
        "--vocab_size", "24", "--embedding_dim", "16", "--hidden_dim", "32",
        "--latent_dim", "8", "--num_layers", "2",
        "--output", str(out),
    ])
    with open(out) as f:
        g = json.load(f)
    toks = np.asarray(g["tokens"])
    assert toks.shape == (64, 16)
    assert 0.0 <= g["validity"] <= 1.0
    assert "selfies" in g  # alphabet present in the synthetic dataset
