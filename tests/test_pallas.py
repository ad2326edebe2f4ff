"""Fused Pallas LSTM gate kernel vs the pure-jnp path (interpret mode on CPU;
the same kernel compiles with Mosaic on a real TPU — exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_vae_tpu.ops.lstm import lstm_gates
from mlx_vae_tpu.ops.pallas_lstm import fused_lstm_gates, pallas_supported


def _rand(shape, s):
    return jax.random.normal(jax.random.PRNGKey(s), shape, jnp.float32)


def test_pallas_supported_gate():
    assert pallas_supported((8, 512), (8, 128))
    assert not pallas_supported((8, 100), (8, 25))
    assert not pallas_supported((8, 512), (8, 64))


def test_fused_forward_matches_jnp():
    gates = _rand((16, 512), 0)
    c = _rand((16, 128), 1)
    h_ref, c_ref = lstm_gates(gates, c)
    h_p, c_p = fused_lstm_gates(gates, c, True)  # interpret=True on CPU
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_ref), rtol=1e-5, atol=1e-5)


def test_fused_backward_matches_jnp():
    gates = _rand((8, 512), 2)
    c = _rand((8, 128), 3)

    def loss_ref(g_, c_):
        h, cn = lstm_gates(g_, c_)
        return jnp.sum(h * 1.3 + cn * 0.7)

    def loss_pal(g_, c_):
        h, cn = fused_lstm_gates(g_, c_, True)
        return jnp.sum(h * 1.3 + cn * 0.7)

    g1 = jax.grad(loss_ref, argnums=(0, 1))(gates, c)
    g2 = jax.grad(loss_pal, argnums=(0, 1))(gates, c)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)


def test_row_blocking_covers_remainder():
    # batch not a multiple of the 256-row block
    gates = _rand((300, 512), 4)
    c = _rand((300, 128), 5)
    h_ref, c_ref = lstm_gates(gates, c)
    h_p, c_p = fused_lstm_gates(gates, c, True)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_ref), rtol=1e-5, atol=1e-5)


class TestFusedGeneration:
    def test_greedy_matches_scan_sampler(self):
        """The fused generation kernel (interpret mode) must reproduce the
        lax.scan sampler exactly in greedy f32 mode."""
        from mlx_vae_tpu.config import ModelConfig
        from mlx_vae_tpu.models import generate_with_temperature, init_decoder_params
        from mlx_vae_tpu.ops.pallas_decoder import pallas_generate

        cfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=128,
                          latent_dim=8, num_conditions=1, num_layers=2)
        params = init_decoder_params(jax.random.PRNGKey(0), cfg)
        z = jax.random.normal(jax.random.PRNGKey(1), (8, cfg.latent_dim))
        cond = jax.random.normal(jax.random.PRNGKey(2), (8, 1))
        k = jax.random.PRNGKey(3)
        ref = generate_with_temperature(params, cfg, z, cond, k,
                                        max_length=12, greedy=True)
        got = pallas_generate(params, cfg, z, cond, k, max_length=12,
                              greedy=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_greedy_eos_masking(self):
        """EOS rows emit pad afterwards. (The stochastic path uses the Mosaic
        PRNG, which has no CPU-interpret lowering — it is exercised on real
        TPU by bench.py/generate.py.)"""
        from mlx_vae_tpu.config import ModelConfig
        from mlx_vae_tpu.models import init_decoder_params
        from mlx_vae_tpu.ops.pallas_decoder import pallas_generate

        cfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=128,
                          latent_dim=8, num_conditions=1, num_layers=2)
        params = init_decoder_params(jax.random.PRNGKey(0), cfg)
        found_eos = 0
        for seed in range(4):  # several z draws so some rows do hit EOS
            z = jax.random.normal(jax.random.PRNGKey(seed), (8, cfg.latent_dim)) * 2
            cond = jnp.zeros((8, 1))
            toks = np.asarray(pallas_generate(params, cfg, z, cond,
                                              jax.random.PRNGKey(3),
                                              max_length=20, greedy=True,
                                              interpret=True))
            for row in toks:
                hits = np.where(row == cfg.end_token)[0]
                if len(hits):
                    found_eos += 1
                    assert np.all(row[hits[0] + 1:] == cfg.pad_token)


class TestFusedSequenceLSTM:
    def _setup(self, I=128, H=128, B=16, L=7):
        from mlx_vae_tpu.ops.lstm import init_lstm_params
        params = init_lstm_params(jax.random.PRNGKey(0), I, H)
        xs = jax.random.normal(jax.random.PRNGKey(1), (B, L, I))
        h0 = jax.random.normal(jax.random.PRNGKey(2), (B, H)) * 0.1
        c0 = jax.random.normal(jax.random.PRNGKey(3), (B, H)) * 0.1
        return params, xs, h0, c0

    def test_forward_matches_scan(self):
        from mlx_vae_tpu.ops.lstm import lstm_sequence
        from mlx_vae_tpu.ops.pallas_seq_lstm import lstm_sequence_pallas
        params, xs, h0, c0 = self._setup()
        a, (ha, ca) = lstm_sequence(params, xs, h0, c0)
        b, (hb, cb) = lstm_sequence_pallas(params, xs, h0, c0,
                                           jnp.float32, True)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(hb), np.asarray(ha),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cb), np.asarray(ca),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match_autodiff(self):
        from mlx_vae_tpu.ops.lstm import lstm_sequence
        from mlx_vae_tpu.ops.pallas_seq_lstm import lstm_sequence_pallas
        params, xs, h0, c0 = self._setup()

        def loss(fn):
            def f(p, x, h, c):
                hs, (hf, cf) = fn(p, x, h, c)
                return (jnp.sum(hs * 1.3) + jnp.sum(hf * 0.7)
                        + jnp.sum(cf * 0.3))
            return f

        g1 = jax.grad(loss(lstm_sequence), argnums=(0, 1, 2, 3))(
            params, xs, h0, c0)
        g2 = jax.grad(loss(lambda p, x, h, c:
                           lstm_sequence_pallas(p, x, h, c, jnp.float32, True)),
                      argnums=(0, 1, 2, 3))(params, xs, h0, c0)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-4)


class TestFusedTrainDecoder:
    def _setup(self, num_layers=2):
        from mlx_vae_tpu.config import ModelConfig
        from mlx_vae_tpu.models import init_decoder_params
        cfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=128,
                          latent_dim=8, num_conditions=1,
                          num_layers=num_layers)
        params = init_decoder_params(jax.random.PRNGKey(0), cfg)
        B, L = 8, 9
        z = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.latent_dim))
        cond = jax.random.normal(jax.random.PRNGKey(2), (B, 1))
        targets = jax.random.randint(jax.random.PRNGKey(3), (B, L), 0,
                                     cfg.vocab_size)
        tf_mask = jnp.asarray([1, 0, 1, 1, 0, 1, 0, 1, 1], bool)
        return cfg, params, z, cond, targets, tf_mask

    def _scan_logits(self, cfg, params, z, cond, targets, tf_mask):
        """Run the scan decoder with an explicit tf_mask by monkeypatching
        the PRNG draw: rebuild its internals here for exactness."""
        from mlx_vae_tpu.models.decoder import (_stacked_cell,
                                                initialize_hidden_state)
        from mlx_vae_tpu.models.layers import embedding, linear
        cond_f = cond.astype(jnp.float32)
        h, c = initialize_hidden_state(params, cfg, z, cond_f)
        token = jnp.full((z.shape[0],), cfg.start_token, jnp.int32)
        logits_all = []
        for t in range(targets.shape[1]):
            emb = embedding(params["embedding"], token, cfg.dtype,
                            onehot=cfg.embed_onehot)
            x = jnp.concatenate([emb.astype(jnp.float32), cond_f], axis=1)
            out, h, c = _stacked_cell(params, cfg, x, h, c)
            logits = linear(params["fc_out"], out, cfg.dtype)
            pred = jnp.argmax(logits, axis=1).astype(jnp.int32)
            token = jnp.where(tf_mask[t], targets[:, t].astype(jnp.int32), pred)
            logits_all.append(logits)
        return jnp.stack(logits_all, axis=1)

    @pytest.mark.parametrize("n_layers", [1, 2, 3, 4])
    def test_forward_matches_scan(self, n_layers):
        from mlx_vae_tpu.ops.pallas_train_decoder import decoder_train_pallas
        from mlx_vae_tpu.models.layers import linear
        cfg, params, z, cond, targets, tf_mask = self._setup(n_layers)
        ref = self._scan_logits(cfg, params, z, cond, targets, tf_mask)
        cond_f = cond.astype(jnp.float32)
        h_init = (linear(params["z_to_hidden"], z, cfg.dtype)
                  + linear(params["condition_to_hidden"], cond_f, cfg.dtype)) / 2.0
        got = decoder_train_pallas(params, cfg, h_init, cond_f, targets,
                                   True, tf_mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("n_layers", [1, 2, 3])
    def test_gradients_match_autodiff(self, n_layers):
        from mlx_vae_tpu.ops.pallas_train_decoder import decoder_train_pallas
        from mlx_vae_tpu.models.layers import linear
        cfg, params, z, cond, targets, tf_mask = self._setup(n_layers)
        cond_f = cond.astype(jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(9),
                              (targets.shape[1], cfg.vocab_size))

        def loss_ref(p, zz, cc):
            logits = self._scan_logits(cfg, p, zz, cc, targets, tf_mask)
            return jnp.sum(logits * w[None])

        def loss_pal(p, zz, cc):
            ccf = cc.astype(jnp.float32)
            h_init = (linear(p["z_to_hidden"], zz, cfg.dtype)
                      + linear(p["condition_to_hidden"], ccf, cfg.dtype)) / 2.0
            logits = decoder_train_pallas(p, cfg, h_init, ccf, targets,
                                          True, tf_mask)
            return jnp.sum(logits * w[None])

        g1 = jax.grad(loss_ref, argnums=(0, 1, 2))(params, z, cond)
        g2 = jax.grad(loss_pal, argnums=(0, 1, 2))(params, z, cond)
        flat1 = jax.tree_util.tree_leaves_with_path(g1)
        flat2 = {jax.tree_util.keystr(k): v
                 for k, v in jax.tree_util.tree_leaves_with_path(g2)}
        for k, a in flat1:
            b = flat2[jax.tree_util.keystr(k)]
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}")


class TestBf16GradParity:
    """bf16 kernel gradient parity (ADVICE r2): the ACTIVATED-gates
    residual contract stores post-sigmoid/tanh values in the compute
    dtype; in bf16 a saturated gate rounds to exactly 1.0 so its a*(1-a)
    derivative term flushes to exactly 0. The f32 parity tests cannot see
    this — these pin the bf16 behavior with tolerances calibrated to the
    measured quantization error, and a saturation-specific case checks the
    flush stays bounded rather than corrupting the update direction."""

    def _setup(self, bias_boost=0.0):
        from mlx_vae_tpu.config import ModelConfig
        from mlx_vae_tpu.models import init_decoder_params
        cfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=128,
                          latent_dim=8, num_conditions=1, num_layers=2,
                          compute_dtype="bfloat16")
        params = init_decoder_params(jax.random.PRNGKey(0), cfg)
        if bias_boost:
            # Push the input/forget gate pre-activations toward saturation
            # (sigmoid(10) rounds to 1.0 in bf16).
            for i in range(cfg.num_layers):
                b = params[f"lstm_layer_{i}"]["bias"]
                H = cfg.hidden_dim
                params[f"lstm_layer_{i}"]["bias"] = \
                    b.at[: 2 * H].add(bias_boost)
        B, L = 8, 9
        z = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.latent_dim))
        cond = jax.random.normal(jax.random.PRNGKey(2), (B, 1))
        targets = jax.random.randint(jax.random.PRNGKey(3), (B, L), 0,
                                     cfg.vocab_size)
        tf_mask = jnp.asarray([1, 0, 1, 1, 0, 1, 0, 1, 1], bool)
        return cfg, params, z, cond, targets, tf_mask

    def _grads(self, cfg, params, z, cond, targets, tf_mask):
        from mlx_vae_tpu.ops.pallas_train_decoder import decoder_train_pallas
        from mlx_vae_tpu.models.layers import linear
        w = jax.random.normal(jax.random.PRNGKey(9),
                              (targets.shape[1], cfg.vocab_size))
        scan = TestFusedTrainDecoder()

        def loss_ref(p, zz, cc):
            logits = scan._scan_logits(cfg, p, zz, cc, targets, tf_mask)
            return jnp.sum(logits * w[None])

        def loss_pal(p, zz, cc):
            ccf = cc.astype(jnp.float32)
            h_init = (linear(p["z_to_hidden"], zz, cfg.dtype)
                      + linear(p["condition_to_hidden"], ccf, cfg.dtype)) / 2.0
            logits = decoder_train_pallas(p, cfg, h_init, ccf, targets,
                                          True, tf_mask)
            return jnp.sum(logits * w[None])

        g1 = jax.grad(loss_ref, argnums=(0, 1, 2))(params, z, cond)
        g2 = jax.grad(loss_pal, argnums=(0, 1, 2))(params, z, cond)
        return g1, g2

    @pytest.mark.parametrize("bias_boost", [0.0, 10.0])
    def test_bf16_gradients_match_autodiff(self, bias_boost):
        cfg, params, z, cond, targets, tf_mask = self._setup(bias_boost)
        g1, g2 = self._grads(cfg, params, z, cond, targets, tf_mask)
        flat1 = jax.tree_util.tree_leaves_with_path(g1)
        flat2 = {jax.tree_util.keystr(k): v
                 for k, v in jax.tree_util.tree_leaves_with_path(g2)}
        # Scale-relative bound per leaf: bf16 has ~3 decimal digits; the
        # residual quantization adds noise proportional to the leaf's
        # gradient magnitude, not elementwise-relative.
        for k, a in flat1:
            b = flat2[jax.tree_util.keystr(k)]
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            scale = max(float(np.abs(a).max()), 1e-3)
            err = float(np.abs(b - a).max()) / scale
            assert err < 4e-2, (
                f"bf16 grad mismatch at {jax.tree_util.keystr(k)} "
                f"(bias_boost={bias_boost}): scaled err {err:.3e}")
            # direction must agree: the update must not be corrupted
            denom = float(np.linalg.norm(a) * np.linalg.norm(b))
            if denom > 1e-8:
                cos = float(np.sum(a * b)) / denom
                assert cos > 0.99, (
                    f"bf16 grad direction at {jax.tree_util.keystr(k)}: "
                    f"cos {cos:.4f}")


class TestFusedDecoderCE:
    def _setup(self, num_layers=2):
        from mlx_vae_tpu.config import ModelConfig
        from mlx_vae_tpu.models import init_decoder_params
        cfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=128,
                          latent_dim=8, num_conditions=1,
                          num_layers=num_layers)
        params = init_decoder_params(jax.random.PRNGKey(0), cfg)
        B, L = 8, 9
        z = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.latent_dim))
        cond = jax.random.normal(jax.random.PRNGKey(2), (B, 1))
        targets = jax.random.randint(jax.random.PRNGKey(3), (B, L), 0,
                                     cfg.vocab_size)
        tf_mask = jnp.asarray([1, 0, 1, 1, 0, 1, 0, 1, 1], bool)
        return cfg, params, z, cond, targets, tf_mask

    def _h_init(self, cfg, params, z, cond):
        from mlx_vae_tpu.models.layers import linear
        cond_f = cond.astype(jnp.float32)
        return (linear(params["z_to_hidden"], z, cfg.dtype)
                + linear(params["condition_to_hidden"], cond_f, cfg.dtype)) / 2.0

    def test_ce_matches_logits_path(self):
        from mlx_vae_tpu.losses.recon import reconstruction_loss
        from mlx_vae_tpu.ops.pallas_train_decoder import (
            decoder_train_ce_pallas, decoder_train_pallas)
        cfg, params, z, cond, targets, tf_mask = self._setup()
        cond_f = cond.astype(jnp.float32)
        h_init = self._h_init(cfg, params, z, cond)
        logits = decoder_train_pallas(params, cfg, h_init, cond_f, targets,
                                      True, tf_mask)
        ref = float(reconstruction_loss(logits, targets, "mean"))
        ce = decoder_train_ce_pallas(params, cfg, h_init, cond_f, targets,
                                     True, tf_mask)
        assert ce.shape == (8,)
        got = float(jnp.sum(ce) / (8 * 9))
        assert abs(got - ref) < 1e-5

    @pytest.mark.parametrize("n_layers", [2, 4])
    def test_ce_gradients_match_logits_path(self, n_layers):
        from mlx_vae_tpu.losses.recon import reconstruction_loss
        from mlx_vae_tpu.ops.pallas_train_decoder import (
            decoder_train_ce_pallas, decoder_train_pallas)
        cfg, params, z, cond, targets, tf_mask = self._setup(n_layers)

        def loss_logits(p, zz, cc):
            ccf = cc.astype(jnp.float32)
            h = self._h_init(cfg, p, zz, cc)
            logits = decoder_train_pallas(p, cfg, h, ccf, targets, True, tf_mask)
            return reconstruction_loss(logits, targets, "mean")

        def loss_ce(p, zz, cc):
            ccf = cc.astype(jnp.float32)
            h = self._h_init(cfg, p, zz, cc)
            ce = decoder_train_ce_pallas(p, cfg, h, ccf, targets, True, tf_mask)
            return jnp.sum(ce) / (targets.shape[0] * targets.shape[1])

        g1 = jax.grad(loss_logits, argnums=(0, 1, 2))(params, z, cond)
        g2 = jax.grad(loss_ce, argnums=(0, 1, 2))(params, z, cond)
        flat2 = {jax.tree_util.keystr(k): v
                 for k, v in jax.tree_util.tree_leaves_with_path(g2)}
        for k, a in jax.tree_util.tree_leaves_with_path(g1):
            b = flat2[jax.tree_util.keystr(k)]
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}")


class TestDecoderCustomVJP:
    """decoder_train_cv (pure-JAX custom VJP for H beyond the kernels) must
    match the scan decoder in forward and gradients."""

    @pytest.mark.parametrize("n_layers", [1, 2, 3])
    def test_forward_and_grads_match_scan(self, n_layers):
        from mlx_vae_tpu.config import ModelConfig
        from mlx_vae_tpu.models import init_decoder_params
        from mlx_vae_tpu.models.layers import linear
        from mlx_vae_tpu.ops.decoder_cv import decoder_train_cv

        cfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=128,
                          latent_dim=8, num_conditions=1,
                          num_layers=n_layers)
        params = init_decoder_params(jax.random.PRNGKey(0), cfg)
        B, L = 8, 9
        z = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.latent_dim))
        cond = jax.random.normal(jax.random.PRNGKey(2), (B, 1)).astype(jnp.float32)
        targets = jax.random.randint(jax.random.PRNGKey(3), (B, L), 0, 24)
        tf_mask = jnp.asarray([1, 0, 1, 1, 0, 1, 0, 1, 1], bool)
        w = jax.random.normal(jax.random.PRNGKey(9), (L, cfg.vocab_size))

        helper = TestFusedTrainDecoder()

        def h_init(p, zz, cc):
            return (linear(p["z_to_hidden"], zz, cfg.dtype)
                    + linear(p["condition_to_hidden"], cc, cfg.dtype)) / 2.0

        def loss_ref(p, zz, cc):
            logits = helper._scan_logits(cfg, p, zz, cc, targets, tf_mask)
            return jnp.sum(logits * w[None])

        def loss_cv(p, zz, cc):
            logits = decoder_train_cv(p, cfg, h_init(p, zz, cc), cc,
                                      targets, tf_mask)
            return jnp.sum(logits * w[None])

        # forward parity
        ref_logits = helper._scan_logits(cfg, params, z, cond, targets, tf_mask)
        got_logits = decoder_train_cv(params, cfg, h_init(params, z, cond),
                                      cond, targets, tf_mask)
        np.testing.assert_allclose(np.asarray(got_logits),
                                   np.asarray(ref_logits),
                                   rtol=1e-5, atol=1e-5)

        g1 = jax.grad(loss_ref, argnums=(0, 1, 2))(params, z, cond)
        g2 = jax.grad(loss_cv, argnums=(0, 1, 2))(params, z, cond)
        flat2 = {jax.tree_util.keystr(k): v
                 for k, v in jax.tree_util.tree_leaves_with_path(g2)}
        for k, a in jax.tree_util.tree_leaves_with_path(g1):
            b = flat2[jax.tree_util.keystr(k)]
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}")


class TestFusedEncoderStack:
    def _setup(self, num_layers):
        from mlx_vae_tpu.config import ModelConfig
        from mlx_vae_tpu.models.encoder import init_encoder_params
        cfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=128,
                          latent_dim=8, num_conditions=1,
                          num_layers=num_layers)
        params = init_encoder_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.randint(jax.random.PRNGKey(1), (8, 9), 0, 24)
        return cfg, params, x

    def _scan_pooled(self, cfg, params, x):
        """Embedding + stacked scans + last-step pooling (the fallback path)."""
        from mlx_vae_tpu.models.layers import embedding
        from mlx_vae_tpu.ops.lstm import lstm_sequence
        B = x.shape[0]
        h0 = jnp.zeros((B, cfg.hidden_dim))
        c0 = jnp.zeros((B, cfg.hidden_dim))
        out = embedding(params["embedding"], x, cfg.dtype)
        for i in range(cfg.num_layers):
            out = lstm_sequence(params[f"lstm_layer_{i}"], out, h0, c0,
                                dtype=cfg.dtype)[0]
        return out[:, -1, :]

    @pytest.mark.parametrize("n_layers", [1, 2, 3])
    def test_pooled_feature_matches_scan(self, n_layers):
        from mlx_vae_tpu.ops.pallas_encoder import encoder_stack_pallas
        cfg, params, x = self._setup(n_layers)
        ref = self._scan_pooled(cfg, params, x)
        got = encoder_stack_pallas(params, cfg, x, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("n_layers", [1, 2, 3])
    def test_gradients_match_autodiff(self, n_layers):
        from mlx_vae_tpu.ops.pallas_encoder import encoder_stack_pallas
        cfg, params, x = self._setup(n_layers)
        w = jax.random.normal(jax.random.PRNGKey(5), (8, cfg.hidden_dim))

        g1 = jax.grad(lambda p: jnp.sum(self._scan_pooled(cfg, p, x) * w))(params)
        g2 = jax.grad(lambda p: jnp.sum(
            encoder_stack_pallas(p, cfg, x, True) * w))(params)
        flat2 = {jax.tree_util.keystr(k): v
                 for k, v in jax.tree_util.tree_leaves_with_path(g2)}
        for k, a in jax.tree_util.tree_leaves_with_path(g1):
            b = flat2[jax.tree_util.keystr(k)]
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}")

    def test_full_encoder_grads_through_heads(self):
        """encoder_apply equivalence is covered on TPU by the oracle/bench
        paths; here check the kernel composes with the heads under grad."""
        from mlx_vae_tpu.models.encoder import _heads
        from mlx_vae_tpu.ops.pallas_encoder import encoder_stack_pallas
        cfg, params, x = self._setup(2)
        cond = jax.random.normal(jax.random.PRNGKey(2), (8, 1))

        def loss(p):
            mu, logvar = _heads(p, cfg, encoder_stack_pallas(p, cfg, x, True),
                                cond)
            return jnp.sum(mu * 1.3) + jnp.sum(logvar * 0.7)

        def loss_ref(p):
            mu, logvar = _heads(p, cfg, self._scan_pooled(cfg, p, x), cond)
            return jnp.sum(mu * 1.3) + jnp.sum(logvar * 0.7)

        g1 = jax.grad(loss_ref)(params)
        g2 = jax.grad(loss)(params)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-4)

    def test_scoped_vmem_limit_raised_only_for_large_frames(self):
        """The encoder backward's f32 dW accumulators are fixed-cost; at
        H=512 they blow the Mosaic compiler's default 16MB scoped-vmem
        limit (measured 17.81MB frame on v5e — real compile failure,
        round 4) while the default config fits comfortably. The raise
        decision must hit exactly the shapes that need it: an always-on
        raised limit regresses mid-shape compile times
        (ops/pallas_decoder.py)."""
        from mlx_vae_tpu.config import ModelConfig
        from mlx_vae_tpu.ops.pallas_encoder import (_bwd_frame_bytes,
                                                    _frame_params_kw,
                                                    _fwd_frame_bytes)
        from mlx_vae_tpu.ops.pallas_train_decoder import _block_rows

        def decisions(H, n, B):
            cfg = ModelConfig(hidden_dim=H, num_layers=n,
                              compute_dtype="bfloat16")
            BB = _block_rows(H, n, B)
            return (bool(_frame_params_kw(_fwd_frame_bytes(cfg, BB))),
                    bool(_frame_params_kw(_bwd_frame_bytes(cfg, BB))))

        assert decisions(256, 2, 1024) == (False, False)  # default config
        assert decisions(384, 2, 1024) == (False, False)  # verify-skill tier
        assert decisions(512, 2, 256) == (False, True)    # the crash shape
        assert decisions(512, 4, 256) == (True, True)


@pytest.mark.slow
def test_stochastic_sampling_statistics():
    """Chi-square + temperature-monotonicity validation of the fused
    sampler's Gumbel path (VERDICT r1 weak #3). The Mosaic PRNG has no CPU
    lowering, so this spawns ``benchmarks/sampling_stats.py`` on the real
    TPU backend; skipped when no TPU is reachable."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the TPU plugin claim the backend
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; print(jax.default_backend())"],
        env=env, capture_output=True, text=True, timeout=300)
    if "tpu" not in probe.stdout:
        pytest.skip("no TPU backend reachable")
    # --skip_throughput: the assertion below is about the DISTRIBUTION
    # checks; the multi-trial timing sections (round 5) add ~5 min of
    # device time that blew this subprocess's budget.
    r = subprocess.run([sys.executable, "benchmarks/sampling_stats.py",
                        "--skip_throughput"],
                       env=env, cwd=repo, capture_output=True, text=True,
                       timeout=580)
    assert r.returncode == 0, (r.stdout + r.stderr)[-2000:]
    assert "chi2_pass=True entropy_monotone=True truncation_pass=True" in r.stdout


@pytest.mark.slow
def test_train_decoder_scaled_config_grads():
    """Scaled-config shapes (hidden 1024 / 4 layers, BASELINE.md): the fused
    CE kernel's gradients must match the scan+CE path (interpret mode, tiny
    batch/length to keep CPU time sane)."""
    from mlx_vae_tpu.config import ModelConfig
    from mlx_vae_tpu.losses.recon import reconstruction_loss
    from mlx_vae_tpu.models import init_decoder_params
    from mlx_vae_tpu.models.decoder import decoder_apply
    from mlx_vae_tpu.models.layers import linear
    from mlx_vae_tpu.ops.pallas_train_decoder import decoder_train_ce_pallas

    cfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=1024,
                      latent_dim=16, num_conditions=1, num_layers=4)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    B, L = 8, 3
    z = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.latent_dim))
    cond = jax.random.normal(jax.random.PRNGKey(2), (B, 1)).astype(jnp.float32)
    targets = jax.random.randint(jax.random.PRNGKey(3), (B, L), 0,
                                 cfg.vocab_size)
    tf_mask = jnp.asarray([1, 0, 1], bool)

    def h_init(p, zz, cc):
        return (linear(p["z_to_hidden"], zz, cfg.dtype)
                + linear(p["condition_to_hidden"], cc, cfg.dtype)) / 2.0

    def loss_scan(p, zz, cc):
        key = jax.random.PRNGKey(0)  # unused: tf drawn below deterministically
        from mlx_vae_tpu.models.decoder import (_stacked_cell,
                                                initialize_hidden_state)
        from mlx_vae_tpu.models.layers import embedding
        h, c = initialize_hidden_state(p, cfg, zz, cc)
        token = jnp.full((B,), cfg.start_token, jnp.int32)
        logits_all = []
        for t in range(L):
            emb = embedding(p["embedding"], token, cfg.dtype,
                            onehot=cfg.embed_onehot)
            x = jnp.concatenate([emb.astype(jnp.float32), cc], axis=1)
            out, h, c = _stacked_cell(p, cfg, x, h, c)
            logits = linear(p["fc_out"], out, cfg.dtype)
            pred = jnp.argmax(logits, axis=1).astype(jnp.int32)
            token = jnp.where(tf_mask[t], targets[:, t].astype(jnp.int32), pred)
            logits_all.append(logits)
        return reconstruction_loss(jnp.stack(logits_all, 1), targets, "mean")

    def loss_ce(p, zz, cc):
        ce = decoder_train_ce_pallas(p, cfg, h_init(p, zz, cc), cc, targets,
                                     True, tf_mask)
        return jnp.sum(ce) / (B * L)

    g1 = jax.grad(loss_scan, argnums=(0, 1))(params, z, cond)
    g2 = jax.grad(loss_ce, argnums=(0, 1))(params, z, cond)
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(g2)}
    for k, a in jax.tree_util.tree_leaves_with_path(g1):
        b = flat2[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}")


@pytest.mark.parametrize("n_layers", [1, 2, 3])
def test_fused_generation_n_layers(n_layers):
    """Generalized N-layer fused sampler: greedy parity vs the scan sampler."""
    from mlx_vae_tpu.config import ModelConfig
    from mlx_vae_tpu.models import generate_with_temperature, init_decoder_params
    from mlx_vae_tpu.ops.pallas_decoder import pallas_generate

    cfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=128,
                      latent_dim=8, num_conditions=1, num_layers=n_layers)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (8, cfg.latent_dim))
    cond = jax.random.normal(jax.random.PRNGKey(2), (8, 1))
    k = jax.random.PRNGKey(3)
    ref = generate_with_temperature(params, cfg, z, cond, k,
                                    max_length=12, greedy=True)
    got = pallas_generate(params, cfg, z, cond, k, max_length=12,
                          greedy=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestGateBlockedSeqLSTM:
    """Gate-axis-blocked kernel variant (large-H shapes): the per-gate
    weight/dW buffers must reproduce the unblocked kernels and autodiff."""

    @pytest.mark.parametrize("G", [2, 4])
    def test_forward_and_grads_match_autodiff(self, G):
        from mlx_vae_tpu.ops import pallas_seq_lstm as psl
        from mlx_vae_tpu.ops.lstm import init_lstm_params, lstm_sequence

        I = H = 128
        B, L = 16, 7
        params = init_lstm_params(jax.random.PRNGKey(0), I, H)
        xs = _rand((B, L, I), 1)
        h0 = _rand((B, H), 2) * 0.1
        c0 = _rand((B, H), 3) * 0.1

        def loss(fn):
            def f(p, x, h, c):
                hs, (hf, cf) = fn(p, x, h, c)
                return (jnp.sum(hs * 1.3) + jnp.sum(hf * 0.7)
                        + jnp.sum(cf * 0.3))
            return f

        g1 = jax.grad(loss(lstm_sequence), argnums=(0, 1, 2, 3))(
            params, xs, h0, c0)
        psl._FORCE_G = G
        try:
            a, _ = lstm_sequence(params, xs, h0, c0)
            b, _ = psl.lstm_sequence_pallas(params, xs, h0, c0,
                                            jnp.float32, True)
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-5)
            g2 = jax.grad(
                loss(lambda p, x, h, c: psl.lstm_sequence_pallas(
                    p, x, h, c, jnp.float32, True)),
                argnums=(0, 1, 2, 3))(params, xs, h0, c0)
        finally:
            psl._FORCE_G = None
        for a_, b_ in zip(jax.tree_util.tree_leaves(g1),
                          jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a_),
                                       rtol=1e-4, atol=1e-4)

    def test_scaled_shapes_now_supported(self):
        from mlx_vae_tpu.ops.pallas_seq_lstm import (_gate_blocks,
                                                     pallas_seq_supported)
        # Scaled config (BASELINE.md): hidden 1024, 4 layers, batch 2048.
        assert pallas_seq_supported(1024, 1024, 2048)
        assert pallas_seq_supported(128, 1024, 2048)  # encoder layer 0
        assert _gate_blocks(1024, 1024) > 1
        assert _gate_blocks(128, 128) == 1  # small shapes keep proven kernels
        assert not pallas_seq_supported(100, 1024, 2048)  # unaligned input

    def test_gate_is_dtype_aware(self):
        """f32 weights double every buffer: the H=1024 shapes that fit the
        VMEM budgets in bf16 must NOT pass the gate at wbytes=4 (they'd hit
        the documented Mosaic compile failure instead of the scan
        fallback), while proven small/mid shapes stay supported."""
        from mlx_vae_tpu.ops.pallas_seq_lstm import (_gate_blocks,
                                                     pallas_seq_supported)
        assert not pallas_seq_supported(1024, 1024, 2048, wbytes=4)
        assert pallas_seq_supported(512, 512, 1024, wbytes=4)
        assert pallas_seq_supported(128, 256, 1024, wbytes=4)
        # blocking accounts for the fatter f32 weight blocks
        assert _gate_blocks(1024, 1024, wbytes=4) >= \
            _gate_blocks(1024, 1024, wbytes=2)


class TestDecoderPallasBackward:
    """decoder_train_cvp: the per-layer Pallas backward (fed either by the
    scan forward with per-layer residual tuples, use_pallas=False, or by the
    gate-blocked fused forward kernel with stacked [L,n,B,.] residuals,
    use_pallas=True) must match decoder_train_cv — including through the
    padded layer-0 input and the embedding path."""

    @pytest.mark.parametrize("n_layers,G,use_pallas", [
        (1, 1, True), (3, 1, True), (2, 2, True), (4, 4, True),
        (3, 1, False), (2, 2, False)])
    def test_grads_match_scan_backward(self, n_layers, G, use_pallas):
        from mlx_vae_tpu.config import ModelConfig
        from mlx_vae_tpu.models import init_decoder_params
        from mlx_vae_tpu.models.layers import linear
        from mlx_vae_tpu.ops import pallas_seq_lstm as psl
        from mlx_vae_tpu.ops.decoder_cv import (decoder_train_cv,
                                                decoder_train_cvp)

        # E + C = 129: exercises the zero-padded lane alignment.
        cfg = ModelConfig(vocab_size=24, embedding_dim=128, hidden_dim=128,
                          latent_dim=8, num_conditions=1,
                          num_layers=n_layers, use_pallas=use_pallas)
        params = init_decoder_params(jax.random.PRNGKey(0), cfg)
        B, L = 8, 9
        z = _rand((B, cfg.latent_dim), 1)
        cond = _rand((B, 1), 2)
        targets = jax.random.randint(jax.random.PRNGKey(3), (B, L), 0, 24)
        tf_mask = jnp.asarray([1, 0, 1, 1, 0, 1, 0, 1, 1], bool)
        w = _rand((L, cfg.vocab_size), 9)

        def h_init(p, zz, cc):
            return (linear(p["z_to_hidden"], zz, cfg.dtype)
                    + linear(p["condition_to_hidden"], cc, cfg.dtype)) / 2.0

        def loss_cv(p, zz, cc):
            logits = decoder_train_cv(p, cfg, h_init(p, zz, cc), cc,
                                      targets, tf_mask)
            return jnp.sum(logits * w[None])

        def loss_cvp(p, zz, cc):
            logits = decoder_train_cvp(p, cfg, h_init(p, zz, cc), cc,
                                       targets, tf_mask, True)
            return jnp.sum(logits * w[None])

        v1 = loss_cv(params, z, cond)
        g1 = jax.grad(loss_cv, argnums=(0, 1, 2))(params, z, cond)
        psl._FORCE_G = G if G > 1 else None
        try:
            v2 = loss_cvp(params, z, cond)
            g2 = jax.grad(loss_cvp, argnums=(0, 1, 2))(params, z, cond)
        finally:
            psl._FORCE_G = None
        np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
        flat2 = {jax.tree_util.keystr(k): v
                 for k, v in jax.tree_util.tree_leaves_with_path(g2)}
        for k, a in jax.tree_util.tree_leaves_with_path(g1):
            b = flat2[jax.tree_util.keystr(k)]
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}")

    def test_supported_gate(self):
        from mlx_vae_tpu.config import ModelConfig
        from mlx_vae_tpu.ops.decoder_cv import decoder_cvp_supported
        scaled = ModelConfig(hidden_dim=1024, latent_dim=512, num_layers=4,
                             embedding_dim=128, compute_dtype="bfloat16")
        assert decoder_cvp_supported(scaled, 2048)
        # f32 doubles every buffer: the same shape must fall back to scan
        # (the gate is dtype-aware; f32 H=1024 fails Mosaic compilation).
        assert not decoder_cvp_supported(
            ModelConfig(hidden_dim=1024, latent_dim=512, num_layers=4,
                        embedding_dim=128), 2048)
        assert not decoder_cvp_supported(
            ModelConfig(hidden_dim=100), 2048)  # unaligned hidden
