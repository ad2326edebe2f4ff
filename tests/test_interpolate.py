"""Latent interpolation (``models/latent_eval.py:latent_path`` + CLI)."""

import json

import jax
import numpy as np
import pytest

from mlx_vae_tpu.config import ModelConfig
from mlx_vae_tpu.models.latent_eval import latent_path

MCFG = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=16,
                   latent_dim=8, num_conditions=1, num_layers=1)


class TestLatentPath:
    def test_endpoints_exact(self):
        rng = np.random.default_rng(0)
        za, zb = rng.normal(0, 1, 8), rng.normal(0, 1, 8)
        for mode in ("slerp", "lerp"):
            p = latent_path(za, zb, 5, mode=mode)
            assert p.shape == (5, 8)
            np.testing.assert_allclose(p[0], za, atol=1e-6)
            np.testing.assert_allclose(p[-1], zb, atol=1e-6)

    def test_slerp_preserves_norm(self):
        """Orthogonal unit vectors: every slerp waypoint stays on the unit
        sphere, while lerp's midpoint falls to norm 1/sqrt(2)."""
        za = np.zeros(8); za[0] = 1.0
        zb = np.zeros(8); zb[1] = 1.0
        s = latent_path(za, zb, 9, mode="slerp")
        np.testing.assert_allclose(np.linalg.norm(s, axis=1), 1.0, atol=1e-6)
        l = latent_path(za, zb, 9, mode="lerp")
        assert np.linalg.norm(l[4]) == pytest.approx(np.sqrt(0.5), abs=1e-6)

    def test_slerp_interpolates_norm_between_radii(self):
        za = np.zeros(4); za[0] = 2.0
        zb = np.zeros(4); zb[1] = 4.0
        s = latent_path(za, zb, 3, mode="slerp")
        assert np.linalg.norm(s[1]) == pytest.approx(3.0, abs=1e-6)

    def test_lerp_midpoint(self):
        p = latent_path(np.zeros(4), np.ones(4), 3, mode="lerp")
        np.testing.assert_allclose(p[1], 0.5, atol=1e-7)

    def test_parallel_endpoints_fall_back_to_lerp(self):
        za = np.ones(4)
        p = latent_path(za, 3.0 * za, 3, mode="slerp")
        np.testing.assert_allclose(p[1], 2.0 * za, atol=1e-6)

    def test_zero_endpoint_falls_back_to_lerp(self):
        p = latent_path(np.zeros(4), np.ones(4), 3, mode="slerp")
        np.testing.assert_allclose(p[1], 0.5, atol=1e-6)

    def test_validation(self):
        with pytest.raises(ValueError, match="steps"):
            latent_path(np.zeros(4), np.ones(4), 1)
        with pytest.raises(ValueError, match="mismatch"):
            latent_path(np.zeros(4), np.ones(5), 3)
        with pytest.raises(ValueError, match="mode"):
            latent_path(np.zeros(4), np.ones(4), 3, mode="cubic")


class TestInterpolateCLI:
    def _setup(self, tmp_path):
        from mlx_vae_tpu.data.prepare import make_synthetic_dataset
        from mlx_vae_tpu.models.vae import ARCVAE
        from mlx_vae_tpu.train.checkpoint import save_checkpoint
        from mlx_vae_tpu.train.optim import adam_init

        d = tmp_path / "d.json"
        make_synthetic_dataset(n=120, vocab_size=24, max_length=16, seed=5,
                               path=str(d))
        vae = ARCVAE(MCFG, jax.random.PRNGKey(0))
        ck = tmp_path / "ck.npz"
        save_checkpoint(ck, 0, vae.params,
                        {k: adam_init(v) for k, v in vae.params.items()}, {})
        return ck, d

    def test_cli_contract(self, tmp_path):
        from mlx_vae_tpu.cli.interpolate import main
        ck, d = self._setup(tmp_path)
        out = tmp_path / "interp.json"
        main(["--checkpoint", str(ck), "--data", str(d), "--steps", "7",
              "--index_a", "0", "--index_b", "3", "--output", str(out)])
        with open(out) as f:
            g = json.load(f)
        toks = np.asarray(g["tokens"])
        assert toks.shape == (7, 16)
        assert np.asarray(g["z_path"]).shape == (7, 8)
        assert g["mode"] == "slerp"
        assert 1 <= g["distinct_decodes"] <= 7
        assert len(g["selfies"]) == 7
        assert len(g["endpoint_selfies"]) == 2

    def test_deterministic_and_modes_differ(self, tmp_path):
        from mlx_vae_tpu.cli.interpolate import main
        ck, d = self._setup(tmp_path)
        outs = []
        for i, mode in enumerate(["slerp", "slerp", "lerp"]):
            out = tmp_path / f"i{i}.json"
            main(["--checkpoint", str(ck), "--data", str(d), "--steps", "5",
                  "--mode", mode, "--output", str(out)])
            with open(out) as f:
                outs.append(json.load(f))
        assert outs[0]["tokens"] == outs[1]["tokens"]  # greedy + fixed path
        assert outs[0]["z_path"] != outs[2]["z_path"]  # slerp vs lerp paths

    def test_index_out_of_range(self, tmp_path):
        from mlx_vae_tpu.cli.interpolate import main
        ck, d = self._setup(tmp_path)
        with pytest.raises(SystemExit):
            main(["--checkpoint", str(ck), "--data", str(d),
                  "--index_b", "99999"])
