import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_vae_tpu.config import ModelConfig
from mlx_vae_tpu.losses import (
    check_loss_sanity,
    complete_vae_loss,
    decoder_loss,
    encoder_loss,
    kl_divergence,
    kl_divergence_stable,
    mutual_information,
    posterior_collapse,
    property_prediction_loss,
    reconstruction_loss,
)
from mlx_vae_tpu.models import init_decoder_params, init_encoder_params, init_predictor_params


class TestRecon:
    def test_golden_value_vs_numpy(self):
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(3, 5, 7)).astype(np.float32)
        targets = rng.integers(0, 7, size=(3, 5))
        # manual stable log-softmax CE, mean over ALL B*L (no pad masking)
        flat = logits.reshape(-1, 7)
        flat = flat - flat.max(axis=1, keepdims=True)
        logp = flat - np.log(np.exp(flat).sum(axis=1, keepdims=True))
        expected = float(-logp[np.arange(15), targets.reshape(-1)].mean())
        got = float(reconstruction_loss(jnp.asarray(logits), jnp.asarray(targets)))
        assert abs(got - expected) < 1e-5

    def test_reductions(self):
        logits = jnp.zeros((2, 3, 4))
        targets = jnp.zeros((2, 3), jnp.int32)
        m = float(reconstruction_loss(logits, targets, "mean"))
        s = float(reconstruction_loss(logits, targets, "sum"))
        assert abs(s - 6 * m) < 1e-5
        assert abs(m - np.log(4)) < 1e-5  # uniform logits -> log V

    def test_perfect_prediction_near_zero(self):
        targets = jnp.asarray([[1, 2], [3, 0]], jnp.int32)
        logits = jax.nn.one_hot(targets, 4) * 100.0
        assert float(reconstruction_loss(logits, targets)) < 1e-4


class TestKL:
    def test_standard_normal_posterior_floors_at_free_bits(self):
        mu = jnp.zeros((4, 8))
        logvar = jnp.zeros((4, 8))
        assert float(kl_divergence(mu, logvar)) == 0.0
        # free bits: each dim floored at fb/latent_dim -> sum = fb
        assert abs(float(kl_divergence(mu, logvar, free_bits=1.0)) - 1.0) < 1e-6

    def test_golden_value(self):
        mu = jnp.full((1, 2), 0.5)
        logvar = jnp.full((1, 2), -1.0)
        # per-dim: -0.5*(1 + (-1) - 0.25 - e^-1) = 0.3089...
        per_dim = -0.5 * (1 - 1 - 0.25 - np.exp(-1.0))
        assert abs(float(kl_divergence(mu, logvar)) - 2 * per_dim) < 1e-5

    def test_clip_semantics(self):
        # inputs outside the defensive clips behave as if clipped
        a = float(kl_divergence(jnp.full((1, 2), 10.0), jnp.full((1, 2), 5.0)))
        b = float(kl_divergence(jnp.full((1, 2), 3.0), jnp.full((1, 2), 3.0)))
        assert abs(a - b) < 1e-5

    def test_nonnegative(self):
        mu = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
        logvar = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
        assert float(kl_divergence(mu, logvar)) >= 0.0

    def test_stable_variant_matches_default_clips(self):
        mu = jax.random.normal(jax.random.PRNGKey(0), (8, 4))
        logvar = jax.random.normal(jax.random.PRNGKey(1), (8, 4)) - 1
        a = float(kl_divergence(mu, logvar, free_bits=0.5))
        b = float(kl_divergence_stable(mu, logvar, free_bits=0.5))
        assert abs(a - b) < 1e-6


class TestInfo:
    def test_mi_nonnegative_and_sign(self):
        # diverse mus -> positive MI; identical posteriors -> ~0
        mu = jax.random.normal(jax.random.PRNGKey(0), (64, 8))
        logvar = jnp.full((64, 8), -1.0)
        assert float(mutual_information(mu, logvar)) > 0.1
        mu_same = jnp.zeros((64, 8))
        assert float(mutual_information(mu_same, logvar)) < 1e-4

    def test_posterior_collapse_penalty(self):
        mu = jnp.zeros((16, 8))
        logvar = jnp.zeros((16, 8))  # MI = 0
        p = float(posterior_collapse(mu, logvar, target_mi=4.85, weight=0.1))
        assert abs(p - 0.485) < 1e-5
        # above-target MI -> zero penalty
        mu2 = jax.random.normal(jax.random.PRNGKey(0), (256, 8)) * 3
        lv2 = jnp.full((256, 8), -6.0)
        assert float(posterior_collapse(mu2, lv2, target_mi=0.01, weight=0.1)) == 0.0


class TestProp:
    def test_corrected_signature_works(self):
        """The reference's call-site (complete_vae_loss.py:65) would raise a
        TypeError; the corrected wiring must not."""
        pred = jnp.asarray([[1.0, 2.0]])
        target = jnp.asarray([[0.0, 0.0]])
        assert abs(float(property_prediction_loss(pred, target)) - 2.5) < 1e-6

    def test_scales(self):
        pred = jnp.asarray([[2.0]])
        target = jnp.asarray([[0.0]])
        scaled = float(property_prediction_loss(pred, target,
                                                property_scales=jnp.asarray([2.0])))
        assert abs(scaled - 1.0) < 1e-4


class TestComplete:
    def test_twelve_key_contract_and_total(self, tiny_cfg, key):
        enc = init_encoder_params(jax.random.PRNGKey(1), tiny_cfg)
        dec = init_decoder_params(jax.random.PRNGKey(2), tiny_cfg)
        x = jax.random.randint(jax.random.PRNGKey(3), (4, 10), 0, tiny_cfg.vocab_size)
        cond = jax.random.normal(jax.random.PRNGKey(4), (4, 1))
        d = complete_vae_loss(enc, dec, None, tiny_cfg, x, cond, key,
                              beta=0.05, lambda_prop=0.1, lambda_collapse=0.001,
                              teacher_forcing_ratio=0.9, free_bits=1.0,
                              lambda_mi=0.01, target_mi=4.85)
        expected_keys = {"total_loss", "recon_loss", "kl_loss", "weighted_kl",
                         "collapse_penalty", "prop_loss", "weighted_prop_loss",
                         "mutual_info", "mi_penalty", "mu", "logvar", "z"}
        assert set(d) == expected_keys
        total = (float(d["recon_loss"]) + 0.05 * float(d["kl_loss"])
                 + float(d["collapse_penalty"]) + 0.1 * float(d["prop_loss"])
                 + float(d["mi_penalty"]))
        assert abs(float(d["total_loss"]) - total) < 1e-5
        # all components nonnegative (reference comment block, complete_vae_loss.py:69-84)
        for k in ("recon_loss", "kl_loss", "collapse_penalty", "prop_loss", "mi_penalty"):
            assert float(d[k]) >= 0.0

    def test_with_predictor(self, tiny_cfg, key):
        enc = init_encoder_params(jax.random.PRNGKey(1), tiny_cfg)
        dec = init_decoder_params(jax.random.PRNGKey(2), tiny_cfg)
        pred = init_predictor_params(jax.random.PRNGKey(5), tiny_cfg)
        x = jax.random.randint(jax.random.PRNGKey(3), (4, 10), 0, tiny_cfg.vocab_size)
        cond = jax.random.normal(jax.random.PRNGKey(4), (4, 1))
        d = complete_vae_loss(enc, dec, pred, tiny_cfg, x, cond, key)
        assert float(d["prop_loss"]) > 0.0

    def test_grads_flow_to_both_models(self, tiny_cfg, key):
        enc = init_encoder_params(jax.random.PRNGKey(1), tiny_cfg)
        dec = init_decoder_params(jax.random.PRNGKey(2), tiny_cfg)
        x = jax.random.randint(jax.random.PRNGKey(3), (4, 10), 0, tiny_cfg.vocab_size)
        cond = jax.random.normal(jax.random.PRNGKey(4), (4, 1))

        def f(e, dct):
            return complete_vae_loss(e, dct, None, tiny_cfg, x, cond, key,
                                     beta=0.05, free_bits=1.0)["total_loss"]

        ge, gd = jax.grad(f, argnums=(0, 1))(enc, dec)
        assert float(jnp.abs(gd["fc_out"]["weight"]).max()) > 0
        assert float(jnp.abs(ge["fc_mu"]["weight"]).max()) > 0
        # gradient-flow smoke analogous to check_decoder_grads.py
        assert float(jnp.abs(ge["embedding"]["weight"]).max()) > 0


class TestStageLosses:
    def test_encoder_loss(self, tiny_cfg, key):
        enc = init_encoder_params(jax.random.PRNGKey(1), tiny_cfg)
        x = jax.random.randint(jax.random.PRNGKey(3), (4, 10), 0, tiny_cfg.vocab_size)
        cond = jnp.zeros((4, 1))
        wkl, mu, logvar, z = encoder_loss(enc, tiny_cfg, x, cond, key, beta=0.4)
        assert wkl.shape == () and z.shape == mu.shape

    def test_decoder_loss(self, tiny_cfg, key):
        dec = init_decoder_params(jax.random.PRNGKey(2), tiny_cfg)
        x = jax.random.randint(jax.random.PRNGKey(3), (4, 10), 0, tiny_cfg.vocab_size)
        cond = jnp.zeros((4, 1))
        z = jnp.zeros((4, tiny_cfg.latent_dim))
        loss = decoder_loss(dec, tiny_cfg, z, cond, x, key)
        assert float(loss) > 0


class TestSanity:
    def test_check_loss_sanity(self):
        mu = jnp.zeros((4, 8))
        logvar = jnp.full((4, 8), -1.0)
        ok = check_loss_sanity(jnp.asarray(3.0), jnp.asarray(2.9),
                               jnp.asarray(0.1), mu, logvar)
        assert ok
        bad = check_loss_sanity(jnp.asarray(float("nan")), jnp.asarray(2.9),
                                jnp.asarray(0.1), mu, logvar)
        assert not bad
        too_big = check_loss_sanity(jnp.asarray(5000.0), jnp.asarray(2.9),
                                    jnp.asarray(0.1), mu, logvar)
        assert not too_big


class TestBF16Mode:
    def test_complete_loss_finite_in_bf16(self, key):
        """bf16 compute mode: loss and grads finite, close to f32 values."""
        cfg32 = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=32,
                            latent_dim=8, num_conditions=1, num_layers=2)
        cfg16 = cfg32.replace(compute_dtype="bfloat16")
        import jax
        enc = init_encoder_params(jax.random.PRNGKey(1), cfg32)
        dec = init_decoder_params(jax.random.PRNGKey(2), cfg32)
        x = jax.random.randint(jax.random.PRNGKey(3), (4, 10), 0, 24)
        cond = jax.random.normal(jax.random.PRNGKey(4), (4, 1))

        def total(cfg):
            return complete_vae_loss(enc, dec, None, cfg, x, cond, key,
                                     beta=0.05, free_bits=1.0,
                                     teacher_forcing_ratio=1.0)["total_loss"]

        l32, l16 = float(total(cfg32)), float(total(cfg16))
        assert np.isfinite(l16)
        assert abs(l32 - l16) / abs(l32) < 0.05  # bf16 rounding only

        g = jax.grad(lambda e: complete_vae_loss(
            e, dec, None, cfg16, x, cond, key, beta=0.05, free_bits=1.0,
            teacher_forcing_ratio=1.0)["total_loss"])(enc)
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.all(np.isfinite(np.asarray(leaf)))
