import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_vae_tpu.config import ModelConfig
from mlx_vae_tpu.models import (
    ARCVAE,
    decoder_apply,
    encoder_apply,
    init_decoder_params,
    init_encoder_params,
    init_predictor_params,
    initialize_hidden_state,
    predictor_apply,
    reparameterize,
)


def _data(cfg, B=4, L=10, seed=1):
    kx, kc = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.randint(kx, (B, L), 0, cfg.vocab_size)
    cond = jax.random.normal(kc, (B, cfg.num_conditions))
    return x, cond


class TestEncoder:
    def test_shapes_and_bounds(self, tiny_cfg, key):
        params = init_encoder_params(key, tiny_cfg)
        x, cond = _data(tiny_cfg)
        mu, logvar = encoder_apply(params, tiny_cfg, x, cond)
        assert mu.shape == (4, tiny_cfg.latent_dim)
        assert logvar.shape == (4, tiny_cfg.latent_dim)
        # tanh bounds (reference encoder.py:126-130)
        assert float(jnp.abs(mu).max()) <= 2.0
        assert float(logvar.max()) <= 0.0
        assert float(logvar.min()) >= -2.0

    def test_logvar_bias_init(self, tiny_cfg, key):
        params = init_encoder_params(key, tiny_cfg)
        np.testing.assert_allclose(np.asarray(params["fc_logvar"]["bias"]), 0.35)

    def test_conditions_matter(self, tiny_cfg, key):
        params = init_encoder_params(key, tiny_cfg)
        x, cond = _data(tiny_cfg)
        mu1, _ = encoder_apply(params, tiny_cfg, x, cond)
        mu2, _ = encoder_apply(params, tiny_cfg, x, cond + 3.0)
        assert float(jnp.abs(mu1 - mu2).max()) > 1e-5

    def test_reparameterize_stats(self, key):
        mu = jnp.ones((2000, 4)) * 0.5
        logvar = jnp.zeros((2000, 4))  # std=1
        z = reparameterize(key, mu, logvar)
        assert abs(float(z.mean()) - 0.5) < 0.05
        assert abs(float(z.std()) - 1.0) < 0.05


class TestDecoder:
    def test_logits_shape(self, tiny_cfg, key):
        params = init_decoder_params(key, tiny_cfg)
        x, cond = _data(tiny_cfg)
        z = jax.random.normal(jax.random.PRNGKey(2), (4, tiny_cfg.latent_dim))
        logits = decoder_apply(params, tiny_cfg, z, cond, target_seq=x,
                               teacher_forcing_ratio=0.5, key=key)
        assert logits.shape == (4, 10, tiny_cfg.vocab_size)

    def test_init_hidden_state(self, tiny_cfg, key):
        params = init_decoder_params(key, tiny_cfg)
        z = jnp.ones((4, tiny_cfg.latent_dim))
        cond = jnp.ones((4, tiny_cfg.num_conditions))
        h, c = initialize_hidden_state(params, tiny_cfg, z, cond)
        assert h.shape == (tiny_cfg.num_layers, 4, tiny_cfg.hidden_dim)
        np.testing.assert_allclose(np.asarray(c), 0.0)
        # all layers identical (replication, reference decoder.py:102-106)
        np.testing.assert_allclose(np.asarray(h[0]), np.asarray(h[1]))

    def test_z_influences_output_by_default(self, tiny_cfg, key):
        """Default mode fixes the reference quirk: z must matter."""
        params = init_decoder_params(key, tiny_cfg)
        x, cond = _data(tiny_cfg)
        z1 = jnp.zeros((4, tiny_cfg.latent_dim))
        z2 = jnp.ones((4, tiny_cfg.latent_dim)) * 2
        l1 = decoder_apply(params, tiny_cfg, z1, cond, target_seq=x,
                           teacher_forcing_ratio=1.0, key=key)
        l2 = decoder_apply(params, tiny_cfg, z2, cond, target_seq=x,
                           teacher_forcing_ratio=1.0, key=key)
        assert float(jnp.abs(l1 - l2).max()) > 1e-4

    def test_reference_zero_state_quirk(self, tiny_cfg, key):
        """Quirk mode: z has NO effect (state never threads —
        reference decoder.py:143,166-168, SURVEY.md §2.1)."""
        cfg = tiny_cfg.replace(reference_zero_state=True)
        params = init_decoder_params(key, cfg)
        x, cond = _data(cfg)
        z1 = jnp.zeros((4, cfg.latent_dim))
        z2 = jnp.ones((4, cfg.latent_dim)) * 2
        l1 = decoder_apply(params, cfg, z1, cond, target_seq=x,
                           teacher_forcing_ratio=1.0, key=key)
        l2 = decoder_apply(params, cfg, z2, cond, target_seq=x,
                           teacher_forcing_ratio=1.0, key=key)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)

    def test_full_teacher_forcing_uses_targets(self, tiny_cfg, key):
        """At TF=1 the step-t input is target[t-1]; logits at t must be
        invariant to targets at >= t (causality check)."""
        params = init_decoder_params(key, tiny_cfg)
        x, cond = _data(tiny_cfg)
        z = jnp.zeros((4, tiny_cfg.latent_dim))
        l1 = decoder_apply(params, tiny_cfg, z, cond, target_seq=x,
                           teacher_forcing_ratio=1.0, key=key)
        x2 = x.at[:, -1].set((x[:, -1] + 1) % tiny_cfg.vocab_size)
        l2 = decoder_apply(params, tiny_cfg, z, cond, target_seq=x2,
                           teacher_forcing_ratio=1.0, key=key)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)

    def test_no_target_runs_max_length(self, tiny_cfg, key):
        params = init_decoder_params(key, tiny_cfg)
        _, cond = _data(tiny_cfg)
        z = jnp.zeros((4, tiny_cfg.latent_dim))
        logits = decoder_apply(params, tiny_cfg, z, cond, max_length=13)
        assert logits.shape == (4, 13, tiny_cfg.vocab_size)


class TestPredictor:
    def test_shapes(self, tiny_cfg, key):
        params = init_predictor_params(key, tiny_cfg)
        z = jnp.zeros((4, tiny_cfg.latent_dim))
        out = predictor_apply(params, tiny_cfg, z)
        assert out.shape == (4, tiny_cfg.num_conditions)


class TestFacade:
    def test_forward_contract(self, tiny_cfg, key):
        vae = ARCVAE(tiny_cfg, key)
        x, cond = _data(tiny_cfg)
        logits, mu, logvar, z = vae(x, cond, jax.random.PRNGKey(9), 0.5)
        assert logits.shape == (4, 10, tiny_cfg.vocab_size)
        assert mu.shape == logvar.shape == z.shape == (4, tiny_cfg.latent_dim)

    def test_generate_contract(self, tiny_cfg, key):
        vae = ARCVAE(tiny_cfg, key)
        cond = jnp.zeros((6, tiny_cfg.num_conditions))
        toks = vae.generate(6, cond, jax.random.PRNGKey(3), max_length=12)
        assert toks.shape == (6, 12)
        assert toks.dtype == jnp.int32

    def test_generate_truncation_through_jit(self, tiny_cfg, key):
        """top_k/top_p must be jit-static on vae_generate: nonzero values
        reach Python `if`s inside sample_logits (regression: passing them
        traced raised TracerBoolConversionError even at the defaults)."""
        vae = ARCVAE(tiny_cfg, key)
        cond = jnp.zeros((6, tiny_cfg.num_conditions))
        toks = vae.generate(6, cond, jax.random.PRNGKey(3), max_length=12,
                            temperature=1.5, top_k=4, top_p=0.9)
        assert toks.shape == (6, 12)
        assert toks.dtype == jnp.int32


class TestBidirectional:
    def test_shapes_and_direction_sensitivity(self, key):
        cfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=32,
                          latent_dim=8, num_conditions=1, num_layers=2,
                          bidirectional=True)
        params = init_encoder_params(key, cfg)
        assert "lstm_layer_0_rev" in params
        # fc_mu input = 2H (bidir features) + H (condition proj)
        assert params["fc_mu"]["weight"].shape == (8, 3 * 32)
        x, cond = _data(cfg)
        mu, logvar = encoder_apply(params, cfg, x, cond)
        assert mu.shape == (4, 8)
        # a bidirectional encoder must be sensitive to a change in the FIRST
        # token even with last-step pooling (reverse scan ends there)
        x2 = x.at[:, 0].set((x[:, 0] + 1) % cfg.vocab_size)
        mu2, _ = encoder_apply(params, cfg, x2, cond)
        assert float(jnp.abs(mu - mu2).max()) > 1e-6

    def test_whole_stack_fallback_prints_notice_once(self, key, capsys):
        """--bidirectional on a TPU-gated path must announce (once per
        flag/shape combo) that the whole-stack fused encoder is disabled,
        instead of silently paying the per-layer cost (VERDICT r3 weak #4).
        Backend mocked to 'tpu'; every kernel gate mocked off so the scan
        path executes on CPU."""
        from unittest import mock

        from mlx_vae_tpu.models import encoder as enc_mod
        from mlx_vae_tpu.ops import pallas_lstm, pallas_seq_lstm

        cfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=32,
                          latent_dim=8, num_conditions=1, num_layers=2,
                          bidirectional=True, use_pallas=True)
        params = init_encoder_params(key, cfg)
        x, cond = _data(cfg)
        enc_mod._stack_fallback_warned.clear()
        with mock.patch.object(jax, "default_backend", return_value="tpu"), \
             mock.patch.object(pallas_seq_lstm, "pallas_seq_supported",
                               return_value=False), \
             mock.patch.object(pallas_lstm, "pallas_supported",
                               return_value=False):
            encoder_apply(params, cfg, x, cond)
            err1 = capsys.readouterr().err
            encoder_apply(params, cfg, x, cond)
            err2 = capsys.readouterr().err
        assert "whole-stack fused encoder" in err1
        assert "--bidirectional" in err1
        assert "whole-stack fused encoder" not in err2  # once per combo


class TestDropout:
    def test_bf16_dropout_grad_traces_on_kernel_path(self, key):
        """Regression (r4): the per-layer fused kernels' custom-VJP bwd
        returned f32 dxs cotangents for bf16 inter-layer activations,
        violating the custom_vjp dtype contract; inter-layer dropout's
        strict `div` transpose rule then raised
        'lax.div requires arguments to have the same dtypes'. Traced
        abstractly (eval_shape) with the backend mocked to 'tpu', so the
        exact TPU kernel path is exercised on CPU."""
        from unittest import mock

        cfg = ModelConfig(vocab_size=80, embedding_dim=128, hidden_dim=256,
                          latent_dim=128, num_conditions=1, num_layers=2,
                          compute_dtype="bfloat16", use_pallas=True,
                          apply_dropout=True, dropout=0.2)
        params = init_encoder_params(key, cfg)
        x = jnp.zeros((1024, 64), jnp.int32)
        cond = jnp.zeros((1024, 1))

        def loss(p):
            mu, lv = encoder_apply(p, cfg, x, cond,
                                   dropout_key=jax.random.PRNGKey(2))
            return jnp.sum(mu * mu) + jnp.sum(lv * lv)

        with mock.patch.object(jax, "default_backend", return_value="tpu"):
            val, grads = jax.eval_shape(jax.value_and_grad(loss), params)
        assert val.shape == ()
        # cotangents must mirror primal dtypes throughout
        assert grads["lstm_layer_0"]["Wx"].dtype == jnp.float32

    def test_dropout_only_when_enabled_and_keyed(self, key):
        cfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=32,
                          latent_dim=8, num_conditions=1, num_layers=2,
                          apply_dropout=True, dropout=0.5)
        params = init_encoder_params(key, cfg)
        x, cond = _data(cfg)
        # no key -> deterministic (eval behavior)
        a, _ = encoder_apply(params, cfg, x, cond)
        b, _ = encoder_apply(params, cfg, x, cond)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # keyed -> stochastic across keys
        c, _ = encoder_apply(params, cfg, x, cond, dropout_key=jax.random.PRNGKey(1))
        d, _ = encoder_apply(params, cfg, x, cond, dropout_key=jax.random.PRNGKey(2))
        assert float(jnp.abs(c - d).max()) > 1e-6

    def test_flag_off_matches_reference_noop(self, tiny_cfg, key):
        """Default: dropout accepted but not applied (reference parity)."""
        params = init_encoder_params(key, tiny_cfg)
        x, cond = _data(tiny_cfg)
        a, _ = encoder_apply(params, tiny_cfg, x, cond,
                             dropout_key=jax.random.PRNGKey(1))
        b, _ = encoder_apply(params, tiny_cfg, x, cond)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
