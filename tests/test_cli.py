"""End-to-end CLI tests (in-process, tiny configs, CPU)."""

import json
from pathlib import Path

import numpy as np
import pytest


@pytest.mark.slow
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


@pytest.mark.slow
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
    assert 0.0 < g["uniqueness"] <= 1.0
    assert 0.0 <= g["novelty"] <= 1.0  # --data given -> novelty reported
    assert "selfies" in g  # alphabet present in the synthetic dataset

    # Without --data: property stats + alphabet come from the checkpoint
    # (ADVICE r1 — previously this silently used mean=0/std=1).
    out2 = tmp_path / "gen2.json"
    gen_main([
        "--checkpoint", str(tmp_path / "ck" / "checkpoint_best.npz"),
        "--num_molecules", "32", "--batch_size", "32", "--max_length", "16",
        "--target", "60",
        "--vocab_size", "24", "--embedding_dim", "16", "--hidden_dim", "32",
        "--latent_dim", "8", "--num_layers", "2",
        "--output", str(out2),
    ])
    with open(out2) as f:
        g2 = json.load(f)
    assert np.asarray(g2["tokens"]).shape == (32, 16)
    assert "selfies" in g2  # alphabet recovered from the checkpoint
    assert "novelty" not in g2  # no --data -> no training set to compare


def test_generate_cli_errors_without_stats(tmp_path):
    """A checkpoint without embedded stats + no --data must refuse to run
    rather than silently mis-condition (ADVICE r1)."""
    import jax
    import numpy as np
    from mlx_vae_tpu.cli.generate import main as gen_main
    from mlx_vae_tpu.config import ModelConfig
    from mlx_vae_tpu.models import ARCVAE
    from mlx_vae_tpu.train.checkpoint import save_checkpoint
    from mlx_vae_tpu.train.optim import adam_init

    mcfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=32,
                       latent_dim=8, num_conditions=1, num_layers=2)
    vae = ARCVAE(mcfg, jax.random.PRNGKey(0))
    opt = {n: adam_init(p) for n, p in vae.params.items()}
    ck = tmp_path / "old.npz"
    save_checkpoint(ck, 0, vae.params, opt, {})  # no data_stats (pre-r2 ckpt)

    shape_flags = ["--vocab_size", "24", "--embedding_dim", "16",
                   "--hidden_dim", "32", "--latent_dim", "8",
                   "--num_layers", "2"]
    with pytest.raises(SystemExit):
        gen_main(["--checkpoint", str(ck), "--num_molecules", "16",
                  "--batch_size", "16", "--max_length", "8",
                  "--output", str(tmp_path / "g.json")] + shape_flags)
    # --no_normalize is the explicit escape hatch
    gen_main(["--checkpoint", str(ck), "--num_molecules", "16",
              "--batch_size", "16", "--max_length", "8", "--no_normalize",
              "--output", str(tmp_path / "g.json")] + shape_flags)
    assert (tmp_path / "g.json").exists()


def test_generate_cli_npz_output(tmp_path):
    """--output foo.npz stores the token matrix as arrays (the bulk-scale
    contract: no tolist/JSON of a million rows) with the metrics riding
    along; content must mirror the JSON document's."""
    import jax
    import numpy as np
    from mlx_vae_tpu.cli.generate import main as gen_main
    from mlx_vae_tpu.config import ModelConfig
    from mlx_vae_tpu.models import ARCVAE
    from mlx_vae_tpu.train.checkpoint import save_checkpoint
    from mlx_vae_tpu.train.optim import adam_init

    mcfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=32,
                       latent_dim=8, num_conditions=1, num_layers=2)
    vae = ARCVAE(mcfg, jax.random.PRNGKey(0))
    opt = {n: adam_init(p) for n, p in vae.params.items()}
    ck = tmp_path / "ck.npz"
    save_checkpoint(ck, 0, vae.params, opt, {},
                    data_stats={"properties_mean": [60.0],
                                "properties_std": [25.0],
                                "alphabet": ["<pad>", "<start>", "<eos>"]
                                + [f"[T{i}]" for i in range(3, 24)]})
    shape_flags = ["--vocab_size", "24", "--embedding_dim", "16",
                   "--hidden_dim", "32", "--latent_dim", "8",
                   "--num_layers", "2"]
    common = ["--checkpoint", str(ck), "--num_molecules", "24",
              "--batch_size", "16", "--max_length", "8"] + shape_flags
    gen_main(common + ["--output", str(tmp_path / "g.npz")])
    gen_main(common + ["--output", str(tmp_path / "g.json")])

    z = np.load(tmp_path / "g.npz", allow_pickle=False)
    import json as _json
    with open(tmp_path / "g.json") as f:
        j = _json.load(f)
    assert z["tokens"].shape == (24, 8)
    np.testing.assert_array_equal(z["tokens"], np.asarray(j["tokens"]))
    assert float(z["validity"]) == j["validity"]
    assert float(z["uniqueness"]) == j["uniqueness"]
    assert list(z["selfies_sample"]) == j["selfies"]


def test_no_normalize_wins_over_available_stats(tmp_path):
    """--no_normalize means 'targets are already model units' — it must
    return identity stats even when the checkpoint embeds real stats
    (previously those silently z-scored the target anyway, code-review r3)."""
    import numpy as np
    from mlx_vae_tpu.cli.common import resolve_property_stats

    ckpt = {"data_stats": {"properties_mean": [60.0], "properties_std": [25.0],
                           "alphabet": ["[C]", "[N]"]}}
    mean, std, alphabet, _ = resolve_property_stats(None, True, ckpt, 1)
    np.testing.assert_array_equal(mean, np.zeros((1, 1), np.float32))
    np.testing.assert_array_equal(std, np.ones((1, 1), np.float32))
    assert alphabet == ["[C]", "[N]"]  # alphabet still flows through
    # and without the flag the embedded stats are used as before
    mean, std, _, _ = resolve_property_stats(None, False, ckpt, 1)
    assert float(mean[0, 0]) == 60.0 and float(std[0, 0]) == 25.0


def test_generate_cli_rejects_invalid_truncation_flags(tmp_path):
    """Out-of-range --top_k/--top_p must die at argparse, before any
    checkpoint load or device work (top_p=0 would empty the support set)."""
    from mlx_vae_tpu.cli.generate import main as gen_main

    for flags in (["--top_k", "-1"], ["--top_p", "0.0"], ["--top_p", "1.5"]):
        with pytest.raises(SystemExit):
            gen_main(["--checkpoint", str(tmp_path / "absent.npz"),
                      "--num_molecules", "16"] + flags)


def test_generate_cli_rejects_malformed_calibration(tmp_path):
    """A malformed --calibrate_response A,B must die at argparse before
    any checkpoint load (B=0 would divide by zero; non-floats are typos)."""
    from mlx_vae_tpu.cli.generate import main as gen_main

    for bad in ("2.38", "a,b", "2.38,0", "1,2,3"):
        with pytest.raises(SystemExit):
            gen_main(["--checkpoint", str(tmp_path / "absent.npz"),
                      "--num_molecules", "16",
                      "--calibrate_response", bad])


def test_generate_cli_calibrated_conditioning(tmp_path, monkeypatch):
    """--calibrate_response A,B sends (target - A)/B to the model on the
    first condition axis: generation with target T and calibration (A, B)
    must produce the same tokens as generation with raw target (T - A)/B
    and no calibration (greedy => deterministic)."""
    import numpy as np
    from mlx_vae_tpu.cli.generate import main as gen_main
    from mlx_vae_tpu.cli.train import main as train_main
    monkeypatch.chdir(tmp_path)
    train_main([
        "--data", str(tmp_path / "d.json"), "--synthetic", "200",
        "--vocab_size", "24", "--embedding_dim", "16", "--hidden_dim", "32",
        "--latent_dim", "8", "--num_layers", "2",
        "--epochs", "1", "--batch_size", "32",
        "--checkpoint_dir", str(tmp_path / "ck"), "--checkpoint_freq", "1",
    ])
    common = ["--checkpoint", str(tmp_path / "ck" / "checkpoint_best.npz"),
              "--data", str(tmp_path / "d.json"), "--num_molecules", "32",
              "--batch_size", "32", "--max_length", "12", "--greedy"]
    a, b, t = 2.0, 0.64, 90.0
    gen_main(common + ["--target", str(t),
                       "--calibrate_response", f"{a},{b}",
                       "--output", str(tmp_path / "cal.npz")])
    gen_main(common + ["--target", str((t - a) / b),
                       "--output", str(tmp_path / "raw.npz")])
    cal = np.load(tmp_path / "cal.npz")["tokens"]
    raw = np.load(tmp_path / "raw.npz")["tokens"]
    assert np.array_equal(cal, raw)


@pytest.mark.slow
def test_generate_cli_infers_shape_from_checkpoint(tmp_path, monkeypatch):
    """Model dims default to the checkpoint's parameter shapes; an explicit
    contradicting flag is a hard error (not a silent broadcast crash)."""
    import pytest
    from mlx_vae_tpu.cli.train import main as train_main
    from mlx_vae_tpu.cli.generate import main as gen_main
    monkeypatch.chdir(tmp_path)
    train_main([
        "--data", str(tmp_path / "d.json"), "--synthetic", "200",
        "--vocab_size", "24", "--embedding_dim", "16", "--hidden_dim", "32",
        "--latent_dim", "8", "--num_layers", "3",
        "--epochs", "1", "--batch_size", "32",
        "--checkpoint_dir", str(tmp_path / "ck"), "--checkpoint_freq", "1",
    ])
    out = tmp_path / "gen.json"
    gen_main([  # no shape flags at all
        "--checkpoint", str(tmp_path / "ck" / "checkpoint_best.npz"),
        "--data", str(tmp_path / "d.json"),
        "--num_molecules", "32", "--batch_size", "32", "--max_length", "12",
        "--output", str(out),
    ])
    with open(out) as f:
        assert np.asarray(json.load(f)["tokens"]).shape == (32, 12)
    with pytest.raises(SystemExit, match="hidden_dim 64 contradicts"):
        gen_main([
            "--checkpoint", str(tmp_path / "ck" / "checkpoint_best.npz"),
            "--data", str(tmp_path / "d.json"), "--hidden_dim", "64",
            "--num_molecules", "32", "--batch_size", "32",
            "--output", str(out),
        ])
