"""Encode CLI + latent/reconstruction eval helpers.

Unit-level: ``models/latent_eval.py`` on hand-built latents with known
statistics. CLI-level: in-process ``encode.py`` runs on a hand-saved
checkpoint over the synthetic corpus (no training — shape/contract checks),
plus a slow trained end-to-end run asserting reconstruction beats chance.
"""

import json

import jax
import numpy as np
import pytest

from mlx_vae_tpu.config import ModelConfig
from mlx_vae_tpu.models.latent_eval import (latent_statistics,
                                            reconstruction_metrics)

MCFG = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=16,
                   latent_dim=8, num_conditions=1, num_layers=1)


class TestLatentStatistics:
    def test_prior_posterior_is_inactive_and_zero_kl(self):
        """q(z|x) = N(0, I) for every x -> KL 0, MI 0, no active units."""
        mu = np.zeros((64, 8), np.float32)
        logvar = np.zeros((64, 8), np.float32)
        s = latent_statistics(mu, logvar)
        assert s["kl_total"] == pytest.approx(0.0, abs=1e-6)
        assert s["active_units"] == 0
        assert s["mutual_information"] == pytest.approx(0.0, abs=1e-5)

    def test_active_units_counts_varying_dims(self):
        """Dims 0-2 vary across x (active), 3-7 constant (collapsed)."""
        rng = np.random.default_rng(0)
        mu = np.zeros((512, 8), np.float32)
        mu[:, :3] = rng.normal(0, 1.0, (512, 3))
        logvar = np.full((512, 8), -1.0, np.float32)
        s = latent_statistics(mu, logvar, au_threshold=0.01)
        assert s["active_units"] == 3
        assert s["active_fraction"] == pytest.approx(3 / 8)
        # the varying dims carry the KL mass
        assert s["kl_per_dim"][:3].min() > s["kl_per_dim"][3:].max()
        assert s["kl_per_dim"].shape == (8,)

    def test_kl_matches_closed_form(self):
        """Constant (mu, logvar) -> per-dim KL has the textbook value."""
        mu = np.full((16, 4), 0.5, np.float32)
        logvar = np.full((16, 4), -1.0, np.float32)
        want = -0.5 * (1.0 + (-1.0) - 0.25 - np.exp(-1.0))
        s = latent_statistics(mu, logvar)
        np.testing.assert_allclose(s["kl_per_dim"], want, rtol=1e-6)

    def test_mi_uses_monitor_eps_variant(self):
        from mlx_vae_tpu.losses.info import mutual_information
        rng = np.random.default_rng(1)
        mu = rng.normal(0, 1, (128, 8)).astype(np.float32)
        logvar = rng.normal(-1, 0.3, (128, 8)).astype(np.float32)
        s = latent_statistics(mu, logvar)
        want = float(mutual_information(mu, logvar, eps=1e-8))
        assert s["mutual_information"] == pytest.approx(want, rel=1e-6)


class TestReconstructionMetrics:
    def test_perfect_reconstruction(self):
        tgt = np.array([[1, 5, 6, 2, 0, 0], [1, 7, 2, 0, 0, 0]])
        rec = reconstruction_metrics(tgt, tgt)
        assert rec == {"token_accuracy": 1.0, "exact_match": 1.0}

    def test_pad_positions_excluded(self):
        tgt = np.array([[1, 5, 6, 2, 0, 0]])
        gen = np.array([[1, 5, 6, 2, 9, 9]])  # differs only in the pad tail
        rec = reconstruction_metrics(gen, tgt)
        assert rec["token_accuracy"] == 1.0
        assert rec["exact_match"] == 1.0  # canonical: both trim at EOS

    def test_partial_accuracy(self):
        tgt = np.array([[1, 5, 6, 2]])  # 4 non-pad positions
        gen = np.array([[1, 5, 7, 2]])  # one wrong
        rec = reconstruction_metrics(gen, tgt)
        assert rec["token_accuracy"] == pytest.approx(3 / 4)
        assert rec["exact_match"] == 0.0

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError, match="mismatch"):
            reconstruction_metrics(np.zeros((2, 4)), np.zeros((2, 5)))


class TestEncodeCLI:
    def _checkpoint(self, tmp_path):
        from mlx_vae_tpu.models.vae import ARCVAE
        from mlx_vae_tpu.train.checkpoint import save_checkpoint
        from mlx_vae_tpu.train.optim import adam_init

        vae = ARCVAE(MCFG, jax.random.PRNGKey(0))
        opt_states = {k: adam_init(v) for k, v in vae.params.items()}
        ck = tmp_path / "ck.npz"
        save_checkpoint(ck, 0, vae.params, opt_states, {})
        return ck

    def _data(self, tmp_path):
        from mlx_vae_tpu.data.prepare import make_synthetic_dataset
        d = tmp_path / "d.json"
        make_synthetic_dataset(n=120, vocab_size=24, max_length=16, seed=3,
                               path=str(d))
        return d

    def test_encode_contract(self, tmp_path):
        from mlx_vae_tpu.cli.encode import main
        ck, d = self._checkpoint(tmp_path), self._data(tmp_path)
        out = tmp_path / "lat.npz"
        rep = tmp_path / "rep.json"
        main(["--checkpoint", str(ck), "--data", str(d), "--split", "test",
              "--batch_size", "32", "--output", str(out),
              "--report", str(rep)])
        z = np.load(out)
        n = z["mu"].shape[0]
        assert n == 12  # 10% test split of 120
        assert z["mu"].shape == (n, 8) and z["logvar"].shape == (n, 8)
        assert z["properties"].shape == (n, 1)
        with open(rep) as f:
            r = json.load(f)
        assert 0 <= r["active_units"] <= 8
        assert len(r["kl_per_dim"]) == 8
        assert 0.0 <= r["token_accuracy"] <= 1.0
        assert 0.0 <= r["next_token_accuracy"] <= 1.0
        assert 0.0 <= r["exact_match"] <= 1.0
        assert r["mutual_information"] >= 0.0

    def test_split_all_and_batched_trim(self, tmp_path):
        """'all' concatenates the three splits; a batch size that does not
        divide N exercises the pad-and-trim path; --no_reconstruct skips
        reconstruction keys."""
        from mlx_vae_tpu.cli.encode import main
        ck, d = self._checkpoint(tmp_path), self._data(tmp_path)
        out = tmp_path / "lat.npz"
        rep = tmp_path / "rep.json"
        main(["--checkpoint", str(ck), "--data", str(d), "--split", "all",
              "--batch_size", "37", "--no_reconstruct",
              "--output", str(out), "--report", str(rep)])
        z = np.load(out)
        assert z["mu"].shape[0] == 120
        with open(rep) as f:
            r = json.load(f)
        assert "token_accuracy" not in r

    def test_padding_does_not_change_results(self, tmp_path):
        """Last-batch padding must be trimmed exactly: two batch sizes, one
        dividing N and one not, give bitwise-identical embeddings."""
        from mlx_vae_tpu.cli.encode import main
        ck, d = self._checkpoint(tmp_path), self._data(tmp_path)
        a, b = tmp_path / "a.npz", tmp_path / "b.npz"
        for out, bs in [(a, "12"), (b, "7")]:
            main(["--checkpoint", str(ck), "--data", str(d),
                  "--split", "test", "--batch_size", bs, "--no_reconstruct",
                  "--output", str(out),
                  "--report", str(tmp_path / "r.json")])
        za, zb = np.load(a), np.load(b)
        np.testing.assert_array_equal(za["mu"], zb["mu"])
        np.testing.assert_array_equal(za["logvar"], zb["logvar"])

    def test_data_parallel_bit_identical(self, tmp_path):
        """--data_parallel (shard_map over the 8 fake devices) must produce
        bit-identical embeddings AND metrics — encoding and the
        deterministic decodes are pure batch parallelism, no collectives."""
        from mlx_vae_tpu.cli.encode import main
        ck, d = self._checkpoint(tmp_path), self._data(tmp_path)
        reports = {}
        for tag, extra in [("single", []), ("dp", ["--data_parallel"])]:
            out = tmp_path / f"{tag}.npz"
            rep = tmp_path / f"{tag}.json"
            main(["--checkpoint", str(ck), "--data", str(d), "--split",
                  "train", "--batch_size", "32", "--output", str(out),
                  "--report", str(rep)] + extra)
            with open(rep) as f:
                reports[tag] = json.load(f)
        za, zb = np.load(tmp_path / "single.npz"), np.load(tmp_path / "dp.npz")
        np.testing.assert_array_equal(za["mu"], zb["mu"])
        np.testing.assert_array_equal(za["logvar"], zb["logvar"])
        assert reports["single"] == reports["dp"]

    @pytest.mark.slow
    def test_trained_reconstruction_beats_untrained(self, tmp_path, monkeypatch):
        """A briefly-trained model must beat a random-init one on
        teacher-forced next-token accuracy — the view of reconstruction the
        training CE optimizes. Calibration (this config, CPU): ~13% at 5
        epochs, plateauing ~12% (the synthetic walk's intrinsic ~1/7
        transition entropy ceiling at this latent capacity) vs ~3.6%
        untrained — so +0.05 is a wide, stable margin. Free-running greedy
        reconstruction (~8-9% vs 3.3%) is reported, not asserted: one early
        divergence derails a row, making it the noisier signal."""
        from mlx_vae_tpu.cli.encode import main as enc_main
        from mlx_vae_tpu.cli.train import main as train_main
        monkeypatch.chdir(tmp_path)
        d = tmp_path / "d.json"
        train_main([
            "--data", str(d), "--synthetic", "400",
            "--vocab_size", "24", "--embedding_dim", "16",
            "--hidden_dim", "32", "--latent_dim", "8", "--num_layers", "2",
            "--epochs", "5", "--batch_size", "32", "--learning_rate", "3e-3",
            "--checkpoint_dir", str(tmp_path / "ck"), "--checkpoint_freq", "1",
        ])
        rep_t = tmp_path / "rep_trained.json"
        enc_main(["--checkpoint", str(tmp_path / "ck" / "checkpoint_best.npz"),
                  "--data", str(d), "--split", "train", "--batch_size", "64",
                  "--output", str(tmp_path / "lt.npz"), "--report", str(rep_t)])

        # Untrained baseline with the SAME architecture (hidden 32, 2 layers).
        from mlx_vae_tpu.models.vae import ARCVAE
        from mlx_vae_tpu.train.checkpoint import save_checkpoint
        from mlx_vae_tpu.train.optim import adam_init
        cfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=32,
                          latent_dim=8, num_conditions=1, num_layers=2)
        vae = ARCVAE(cfg, jax.random.PRNGKey(99))
        ck0 = tmp_path / "ck0.npz"
        save_checkpoint(ck0, 0, vae.params,
                        {k: adam_init(v) for k, v in vae.params.items()}, {})
        rep_u = tmp_path / "rep_untrained.json"
        enc_main(["--checkpoint", str(ck0), "--data", str(d),
                  "--split", "train", "--batch_size", "64",
                  "--output", str(tmp_path / "lu.npz"), "--report", str(rep_u)])

        with open(rep_t) as f:
            trained = json.load(f)
        with open(rep_u) as f:
            untrained = json.load(f)
        assert (trained["next_token_accuracy"]
                > untrained["next_token_accuracy"] + 0.05)
