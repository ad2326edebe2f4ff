"""Contract tests for small pure helpers + a randomized support-gate sweep.

These helpers are load-bearing (the checkpoint key contract rides on the
tree utilities, every kernel dispatch rides on the support gates) but were
previously covered only through integration paths; a regression surfaced as
an opaque trainer/CLI failure. Each contract is pinned directly here.
"""

import itertools
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_vae_tpu.config import ModelConfig


class TestTreeUtils:
    def test_global_norm_matches_manual(self):
        from mlx_vae_tpu.utils.tree import global_norm
        a = {"w": jnp.asarray([[3.0, 0.0]]), "b": jnp.asarray([4.0])}
        b = {"w": jnp.asarray([12.0])}
        # sqrt(9 + 16 + 144) = 13 — one norm over BOTH trees, the
        # reference's (encoder, decoder) joint clip semantics
        assert float(global_norm(a, b)) == pytest.approx(13.0)

    def test_global_norm_bf16_leaves_accumulate_f32(self):
        from mlx_vae_tpu.utils.tree import global_norm
        big = {"w": jnp.full((256, 256), 8.0, jnp.bfloat16)}
        expect = np.sqrt(256 * 256 * 64.0)
        assert float(global_norm(big)) == pytest.approx(expect, rel=1e-6)

    def test_scale_and_zeros(self):
        from mlx_vae_tpu.utils.tree import tree_scale, tree_zeros_like
        t = {"a": jnp.asarray([2.0, 4.0]), "n": {"b": jnp.asarray(6.0)}}
        s = tree_scale(t, 0.5)
        assert float(s["n"]["b"]) == 3.0
        z = tree_zeros_like(t)
        assert float(z["a"].sum()) == 0.0 and z["a"].dtype == t["a"].dtype

    def test_numpy_roundtrip_preserves_structure_and_values(self):
        from mlx_vae_tpu.utils.tree import tree_from_numpy, tree_to_numpy
        t = {"enc": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
             "step": jnp.int32(7)}
        h = tree_to_numpy(t)
        assert isinstance(h["enc"]["w"], np.ndarray)  # host arrays, npz-ready
        back = tree_from_numpy(h)
        assert isinstance(back["enc"]["w"], jax.Array)
        np.testing.assert_array_equal(np.asarray(back["enc"]["w"]), h["enc"]["w"])
        assert int(back["step"]) == 7


def test_latest_best(tmp_path):
    from mlx_vae_tpu.train.checkpoint import latest_best
    assert latest_best(tmp_path) is None
    (tmp_path / "checkpoint_epoch_003.npz").write_bytes(b"x")
    assert latest_best(tmp_path) is None  # only checkpoint_best counts
    best = tmp_path / "checkpoint_best.npz"
    best.write_bytes(b"x")
    assert latest_best(tmp_path) == best


def test_history_schema_is_the_reference_15_series():
    from mlx_vae_tpu.train.history import HISTORY_KEYS, make_history
    # the exact series set of /root/reference/trainer.py:84-100
    assert set(HISTORY_KEYS) == {
        "epoch",
        "train_loss", "train_recon", "train_kl", "train_collapse", "train_prop",
        "val_loss", "val_recon", "val_kl", "val_collapse", "val_prop",
        "beta", "teacher_forcing", "learning_rate", "mutual_info",
    }
    h = make_history()
    assert list(h) == HISTORY_KEYS and all(v == [] for v in h.values())
    h2 = make_history()
    h2["epoch"].append(1)
    assert h["epoch"] == []  # fresh lists per call, no shared state


def test_infer_model_shape_roundtrips_init():
    from mlx_vae_tpu.cli.generate import infer_model_shape
    from mlx_vae_tpu.models.decoder import init_decoder_params
    cfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=32,
                      latent_dim=8, num_conditions=3, num_layers=3)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    shape = infer_model_shape(jax.tree_util.tree_map(np.asarray, params))
    assert shape == {"vocab_size": 24, "embedding_dim": 16, "hidden_dim": 32,
                     "latent_dim": 8, "num_conditions": 3, "num_layers": 3}


def test_hidden_init_row_is_mean_of_projections():
    from mlx_vae_tpu.models.decoder import hidden_init_row, init_decoder_params
    cfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=32,
                      latent_dim=8, num_conditions=2, num_layers=2)
    params = init_decoder_params(jax.random.PRNGKey(1), cfg)
    z = jax.random.normal(jax.random.PRNGKey(2), (4, 8))
    c = jax.random.normal(jax.random.PRNGKey(3), (4, 2))
    got = hidden_init_row(params, cfg, z, c)
    # MLX layout: weight [out, in], applied as x @ W.T + b (models/layers.py)
    pz = z @ params["z_to_hidden"]["weight"].T + params["z_to_hidden"]["bias"]
    pc = (c @ params["condition_to_hidden"]["weight"].T
          + params["condition_to_hidden"]["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray((pz + pc) / 2),
                               rtol=1e-5, atol=1e-6)


class TestSyntheticTPSA:
    def test_eos_truncation_and_formula(self):
        from mlx_vae_tpu.data.prepare import EOS, synthetic_tpsa
        light = 3            # token id <= vocab//2 -> not heavy
        heavy = 70           # > 40 -> heavy
        toks = [light, heavy, EOS, heavy, heavy, heavy]  # tail ignored
        kept = [light, heavy, EOS]
        hf = float(np.mean([t > 40 for t in kept]))
        assert synthetic_tpsa(toks) == pytest.approx(20.0 + 1.1 * 3 + 45.0 * hf)

    def test_empty(self):
        from mlx_vae_tpu.data.prepare import synthetic_tpsa
        assert synthetic_tpsa([]) == 0.0


# ---------------------------------------------------------------- gate sweep

def _configs():
    """A deterministic sweep across the gate-relevant axes, far outside the
    hand-picked corners: unaligned H, tiny/huge vocab, deep stacks, both
    dtypes."""
    hs = [96, 100, 128, 256, 384, 512, 640, 768, 1024, 2048]
    ns = [1, 2, 3, 4, 6, 8, 10]
    dts = ["float32", "bfloat16"]
    vocabs = [24, 80, 512, 50000]
    rng = np.random.default_rng(7)
    combos = list(itertools.product(hs, ns, dts))
    picks = rng.choice(len(combos), size=40, replace=False)
    for i in picks:
        h, n, dt = combos[i]
        v = int(rng.choice(vocabs))
        e = int(rng.choice([16, 128, 512]))
        yield ModelConfig(vocab_size=v, embedding_dim=e, hidden_dim=int(h),
                          latent_dim=32, num_conditions=1, num_layers=int(n),
                          compute_dtype=dt)


def test_support_gates_total_on_random_configs():
    """Every support gate must return a plain bool (no exception) for ANY
    config — the gates are the only thing standing between an arbitrary CLI
    flag combination and a Mosaic compile failure, so they must be total
    functions. CLAUDE.md invariant: unsupported shapes fall back, never
    crash."""
    import jax as _jax
    from mlx_vae_tpu.ops.decoder_cv import decoder_cvp_supported
    from mlx_vae_tpu.ops.pallas_decoder import pallas_generate_supported
    from mlx_vae_tpu.ops.pallas_encoder import pallas_encoder_supported
    from mlx_vae_tpu.ops.pallas_train_decoder import (
        fwd_blk_supported, pallas_train_decoder_supported)

    with mock.patch.object(_jax, "default_backend", return_value="tpu"):
        for cfg in _configs():
            for batch in (32, 1024, 16384):
                for gate in (pallas_train_decoder_supported,
                             pallas_encoder_supported, fwd_blk_supported,
                             decoder_cvp_supported):
                    r = gate(cfg, batch)
                    assert isinstance(r, (bool, np.bool_)), (cfg, gate)
                for greedy in (False, True):
                    r = pallas_generate_supported(cfg, batch, greedy=greedy)
                    assert isinstance(r, (bool, np.bool_)), (cfg, greedy)


def test_unaligned_shape_falls_back_to_scan_end_to_end():
    """An H the kernels cannot take (100: unaligned lanes) must still train
    and sample through the scan paths with use_pallas=True — the gates route
    around the kernels silently."""
    from mlx_vae_tpu.losses.complete import complete_vae_loss
    from mlx_vae_tpu.models.sampling import generate_with_temperature
    from mlx_vae_tpu.models.vae import ARCVAE

    cfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=100,
                      latent_dim=8, num_conditions=1, num_layers=2,
                      use_pallas=True)
    vae = ARCVAE(cfg, key=jax.random.PRNGKey(0))
    x = jax.random.randint(jax.random.PRNGKey(1), (4, 12), 0, 24)
    c = jax.random.normal(jax.random.PRNGKey(2), (4, 1))
    out = complete_vae_loss(vae.params["encoder"], vae.params["decoder"],
                            None, cfg, x, c, jax.random.PRNGKey(3),
                            beta=0.01, teacher_forcing_ratio=0.5)
    assert np.isfinite(float(out["total_loss"]))
    z = jax.random.normal(jax.random.PRNGKey(4), (4, 8))
    toks = generate_with_temperature(vae.params["decoder"], cfg, z, c,
                                     jax.random.PRNGKey(5), max_length=12,
                                     temperature=1.0, greedy=False)
    assert toks.shape == (4, 12)
