"""Latent-space property optimization (``models/latent_opt.py`` + CLI).

The workflow the reference's dead predictor path implies but cannot run
(``/root/reference/train.py:186`` passes ``property_predictor=None``):
gradient descent of latent candidates against the trained z->properties
surrogate, then decoding. Unit tests drive the optimizer against hand-built
predictors whose optimum is known; the CLI test round-trips a real tiny
trained checkpoint.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_vae_tpu.config import ModelConfig
from mlx_vae_tpu.models.latent_opt import latent_objective, optimize_latent
from mlx_vae_tpu.models.predictor import init_predictor_params, predictor_apply

MCFG = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=16,
                   latent_dim=8, num_conditions=2, num_layers=1)


def _linear_region_predictor(key, scale=0.1, bias=5.0):
    """Predictor whose relu stays strictly active for |z| <= 3: with
    |W1| <= scale, |W1 z|_inf <= scale*latent*3 < bias, so the head is an
    affine map and the optimizer's fixed point is analytically reachable."""
    k1, k2 = jax.random.split(key)
    return {
        "fc_hidden": {
            "weight": scale * jax.random.normal(k1, (16, 8), jnp.float32),
            "bias": jnp.full((16,), bias, jnp.float32),
        },
        "fc_out": {
            "weight": scale * jax.random.normal(k2, (2, 16), jnp.float32),
            "bias": jnp.zeros((2,), jnp.float32),
        },
    }


class TestOptimizeLatent:
    def test_objective_decreases(self):
        params = {"predictor": init_predictor_params(jax.random.PRNGKey(0), MCFG)}
        z0 = jax.random.normal(jax.random.PRNGKey(1), (32, 8))
        target = jnp.asarray([1.0, -0.5])
        z_opt, info = optimize_latent(params, MCFG, z0, target,
                                      steps=100, lr=0.05, prior_weight=0.01)
        obj = np.asarray(info["objective"])
        assert z_opt.shape == z0.shape
        # steps+1 entries: obj[t] is the objective after t updates, so
        # obj[-1] belongs to the RETURNED z_opt (code-review r3: the scan
        # alone emits pre-update losses, one iterate behind z_opt).
        assert obj.shape == (101,)
        assert obj[-1] < 0.2 * obj[0]
        np.testing.assert_allclose(
            obj[-1],
            np.asarray(latent_objective(params["predictor"], MCFG,
                                        z_opt, target,
                                        prior_weight=0.01)).mean(),
            rtol=1e-5)
        # reported predictions match a direct re-application
        np.testing.assert_allclose(
            np.asarray(info["pred_final"]),
            np.asarray(predictor_apply(params["predictor"], MCFG, z_opt)),
            rtol=1e-6)

    def test_reaches_affine_target_exactly(self):
        """In the relu-linear region the objective is convex quadratic;
        Adam must drive the per-candidate mse to ~0."""
        params = {"predictor": _linear_region_predictor(jax.random.PRNGKey(2))}
        z0 = jax.random.normal(jax.random.PRNGKey(3), (16, 8)) * 0.5
        # Reachable by construction: the target is the predictor's own
        # output at an interior point, so a zero-objective optimum exists
        # inside the z_clip box.
        z_star = jnp.full((1, 8), 0.7, jnp.float32)
        target = predictor_apply(params["predictor"], MCFG, z_star)[0]
        z_opt, info = optimize_latent(params, MCFG, z0, target,
                                      steps=600, lr=0.05, prior_weight=0.0)
        final = np.asarray(latent_objective(params["predictor"], MCFG,
                                            z_opt, target))
        assert final.max() < 1e-3
        np.testing.assert_allclose(np.asarray(info["pred_final"]),
                                   np.tile(np.asarray(target), (16, 1)),
                                   atol=0.03)

    def test_jit_and_determinism(self):
        params = {"predictor": init_predictor_params(jax.random.PRNGKey(4), MCFG)}
        z0 = jax.random.normal(jax.random.PRNGKey(5), (8, 8))
        target = jnp.asarray([0.0, 0.0])
        run = jax.jit(lambda z: optimize_latent(params, MCFG, z, target,
                                                steps=50, lr=0.1)[0])
        a, b = run(z0), run(z0)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # jitted result equals the eager scan bitwise (same program)
        c, _ = optimize_latent(params, MCFG, z0, target, steps=50, lr=0.1)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    def test_z_clip_hard_bound(self):
        params = {"predictor": init_predictor_params(jax.random.PRNGKey(6), MCFG)}
        z0 = jax.random.normal(jax.random.PRNGKey(7), (8, 8))
        z_opt, _ = optimize_latent(params, MCFG, z0,
                                   jnp.asarray([50.0, 50.0]),  # unreachable
                                   steps=200, lr=1.0, prior_weight=0.0,
                                   z_clip=2.5)
        assert np.abs(np.asarray(z_opt)).max() <= 2.5 + 1e-6

    def test_target_broadcast(self):
        params = {"predictor": init_predictor_params(jax.random.PRNGKey(8), MCFG)}
        z0 = jax.random.normal(jax.random.PRNGKey(9), (4, 8))
        t1 = jnp.asarray([0.5, -0.5])
        t2 = jnp.tile(t1[None, :], (4, 1))
        a, _ = optimize_latent(params, MCFG, z0, t1, steps=30, lr=0.05)
        b, _ = optimize_latent(params, MCFG, z0, t2, steps=30, lr=0.05)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_prior_weight_shrinks_solution_norm(self):
        params = {"predictor": _linear_region_predictor(jax.random.PRNGKey(10))}
        z0 = jax.random.normal(jax.random.PRNGKey(11), (16, 8))
        target = jnp.asarray([0.8, -0.3])
        free, _ = optimize_latent(params, MCFG, z0, target,
                                  steps=400, lr=0.05, prior_weight=0.0)
        reg, _ = optimize_latent(params, MCFG, z0, target,
                                 steps=400, lr=0.05, prior_weight=1.0)
        assert (np.linalg.norm(np.asarray(reg), axis=1).mean()
                < np.linalg.norm(np.asarray(free), axis=1).mean())

    def test_missing_predictor_raises(self):
        with pytest.raises(ValueError, match="use_property_predictor"):
            optimize_latent({"decoder": {}}, MCFG,
                            jnp.zeros((2, 8)), jnp.zeros((2,)), steps=1)


class TestOptimizeCLI:
    def test_cli_on_synthetic_checkpoint(self, tmp_path):
        """Fast path: a hand-saved checkpoint (no training) exercises stats
        resolution, shape inference, optimization, and decoding."""
        from mlx_vae_tpu.cli.optimize import main
        from mlx_vae_tpu.models.vae import ARCVAE
        from mlx_vae_tpu.train.checkpoint import save_checkpoint
        from mlx_vae_tpu.train.optim import adam_init

        vae = ARCVAE(MCFG, jax.random.PRNGKey(12), with_predictor=True)
        opt_states = {k: adam_init(v) for k, v in vae.params.items()}
        ck = tmp_path / "checkpoint_best.npz"
        save_checkpoint(ck, 0, vae.params, opt_states, {},
                        data_stats={"properties_mean": [60.0, 2.0],
                                    "properties_std": [25.0, 1.0],
                                    "alphabet": ["[C]", "[N]", "[O]"]})
        out = tmp_path / "opt.json"
        main(["--checkpoint", str(ck), "--target", "90", "2.5",
              "--num_molecules", "16", "--opt_steps", "40",
              "--max_length", "12", "--output", str(out), "--seed", "7"])
        with open(out) as f:
            g = json.load(f)
        toks = np.asarray(g["tokens"])
        assert toks.shape == (16, 12)
        assert np.asarray(g["z_optimized"]).shape == (16, 8)
        assert g["objective_final"] <= g["objective_first"]
        assert len(g["predicted_after_mean"]) == 2
        assert 0.0 < g["uniqueness"] <= 1.0
        assert "selfies" in g

    def test_cli_rejects_predictorless_checkpoint(self, tmp_path):
        from mlx_vae_tpu.cli.optimize import main
        from mlx_vae_tpu.models.vae import ARCVAE
        from mlx_vae_tpu.train.checkpoint import save_checkpoint
        from mlx_vae_tpu.train.optim import adam_init

        vae = ARCVAE(MCFG, jax.random.PRNGKey(13))
        opt_states = {k: adam_init(v) for k, v in vae.params.items()}
        ck = tmp_path / "ck.npz"
        save_checkpoint(ck, 0, vae.params, opt_states, {})
        with pytest.raises(SystemExit, match="predictor"):
            main(["--checkpoint", str(ck), "--target", "90", "1.0",
                  "--num_molecules", "8", "--opt_steps", "5",
                  "--no_normalize"])

    @pytest.mark.slow
    def test_cli_end_to_end_trained(self, tmp_path, monkeypatch):
        """Full workflow: train a tiny predictor-headed model on the
        synthetic corpus, then optimize toward a TPSA target — the
        surrogate's de-normalized prediction must move toward it."""
        from mlx_vae_tpu.cli.optimize import main as opt_main
        from mlx_vae_tpu.cli.train import main as train_main
        monkeypatch.chdir(tmp_path)
        train_main([
            "--data", str(tmp_path / "d.json"), "--synthetic", "400",
            "--vocab_size", "24", "--embedding_dim", "16",
            "--hidden_dim", "32", "--latent_dim", "8", "--num_layers", "2",
            "--epochs", "2", "--batch_size", "32", "--learning_rate", "3e-3",
            "--use_property_predictor",
            "--checkpoint_dir", str(tmp_path / "ck"), "--checkpoint_freq", "1",
        ])
        out = tmp_path / "opt.json"
        opt_main([
            "--checkpoint", str(tmp_path / "ck" / "checkpoint_best.npz"),
            "--data", str(tmp_path / "d.json"),
            "--target", "90", "--num_molecules", "64",
            "--opt_steps", "200", "--max_length", "16",
            "--output", str(out),
        ])
        with open(out) as f:
            g = json.load(f)
        target = 90.0
        before = g["predicted_before_mean"][0]
        after = g["predicted_after_mean"][0]
        assert abs(after - target) < abs(before - target)
        assert g["objective_final"] < g["objective_first"]
