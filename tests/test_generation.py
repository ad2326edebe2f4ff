import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_vae_tpu.config import ModelConfig
from mlx_vae_tpu.data.prepare import EOS, selfies_validity
from mlx_vae_tpu.models import generate_with_temperature, init_decoder_params
from mlx_vae_tpu.ops.sampling import sample_logits


def _setup(tiny_cfg, seed=0):
    params = init_decoder_params(jax.random.PRNGKey(seed), tiny_cfg)
    z = jax.random.normal(jax.random.PRNGKey(seed + 1), (8, tiny_cfg.latent_dim))
    cond = jax.random.normal(jax.random.PRNGKey(seed + 2), (8, tiny_cfg.num_conditions))
    return params, z, cond


def test_fixed_key_is_deterministic(tiny_cfg):
    params, z, cond = _setup(tiny_cfg)
    k = jax.random.PRNGKey(7)
    t1 = generate_with_temperature(params, tiny_cfg, z, cond, k, max_length=16)
    t2 = generate_with_temperature(params, tiny_cfg, z, cond, k, max_length=16)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_temperature_changes_samples(tiny_cfg):
    """Real categorical sampling: temperature must matter (the reference's
    argmax TODO makes it a no-op there — decoder_sampling.py:115-117)."""
    params, z, cond = _setup(tiny_cfg)
    k = jax.random.PRNGKey(7)
    cold = generate_with_temperature(params, tiny_cfg, z, cond, k,
                                     max_length=24, temperature=0.01)
    hot = generate_with_temperature(params, tiny_cfg, z, cond, k,
                                    max_length=24, temperature=5.0)
    assert not np.array_equal(np.asarray(cold), np.asarray(hot))
    # single-step: near-zero temperature == argmax (full AR rollouts can
    # diverge from one near-tie, so compare at the op level)
    logits = jax.random.normal(jax.random.PRNGKey(11), (64, tiny_cfg.vocab_size))
    cold_step = sample_logits(k, logits, temperature=1e-4)
    greedy_step = sample_logits(k, logits, greedy=True)
    np.testing.assert_array_equal(np.asarray(cold_step), np.asarray(greedy_step))


def test_greedy_is_key_independent(tiny_cfg):
    params, z, cond = _setup(tiny_cfg)
    g1 = generate_with_temperature(params, tiny_cfg, z, cond,
                                   jax.random.PRNGKey(1), max_length=12, greedy=True)
    g2 = generate_with_temperature(params, tiny_cfg, z, cond,
                                   jax.random.PRNGKey(2), max_length=12, greedy=True)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_eos_masks_remainder(tiny_cfg):
    params, z, cond = _setup(tiny_cfg)
    toks = np.asarray(generate_with_temperature(
        params, tiny_cfg, z, cond, jax.random.PRNGKey(3),
        max_length=30, temperature=3.0))
    for row in toks:
        hits = np.where(row == tiny_cfg.end_token)[0]
        if len(hits):
            # everything after the first EOS must be pad
            assert np.all(row[hits[0] + 1:] == tiny_cfg.pad_token)


def test_sample_logits_distribution():
    logits = jnp.log(jnp.asarray([[0.7, 0.2, 0.1]])).repeat(4000, axis=0)
    toks = sample_logits(jax.random.PRNGKey(0), logits, temperature=1.0)
    frac0 = float((toks == 0).mean())
    assert 0.65 < frac0 < 0.75
    greedy = sample_logits(jax.random.PRNGKey(0), logits, greedy=True)
    assert int(greedy.sum()) == 0


def test_z_conditions_generation(tiny_cfg):
    """z must influence generated tokens (broken in the reference where the
    decoder state is never threaded)."""
    params, _, cond = _setup(tiny_cfg)
    z1 = jnp.full((8, tiny_cfg.latent_dim), -2.0)
    z2 = jnp.full((8, tiny_cfg.latent_dim), 2.0)
    k = jax.random.PRNGKey(5)
    t1 = generate_with_temperature(params, tiny_cfg, z1, cond, k,
                                   max_length=20, greedy=True)
    t2 = generate_with_temperature(params, tiny_cfg, z2, cond, k,
                                   max_length=20, greedy=True)
    assert not np.array_equal(np.asarray(t1), np.asarray(t2))


def test_validity_proxy():
    good = [[5, 6, 7, EOS, 0, 0]]
    bad = [[5, 6, 7, 8, 9, 10]]  # never terminated
    assert selfies_validity(good, []) == 1.0
    assert selfies_validity(bad, []) == 0.0


class TestTruncatedSampling:
    """top-k / top-p (nucleus) sampling — an extension beyond the
    reference's temperature-only surface (decoder_sampling.py:110-117)."""

    def test_top_k_restricts_support(self):
        logits = jax.random.normal(jax.random.PRNGKey(0), (2000, 12))
        toks = np.asarray(sample_logits(jax.random.PRNGKey(1), logits,
                                        temperature=2.0, top_k=3))
        top3 = np.asarray(jax.lax.top_k(logits, 3)[1])
        assert all(t in row for t, row in zip(toks, top3))
        # k >= vocab is a no-op
        full = sample_logits(jax.random.PRNGKey(1), logits, temperature=2.0)
        wide = sample_logits(jax.random.PRNGKey(1), logits, temperature=2.0,
                             top_k=12)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(wide))

    def test_top_k_one_is_argmax(self):
        logits = jax.random.normal(jax.random.PRNGKey(2), (512, 9))
        one = sample_logits(jax.random.PRNGKey(3), logits, temperature=4.0,
                            top_k=1)
        np.testing.assert_array_equal(
            np.asarray(one), np.asarray(jnp.argmax(logits, -1)))

    def test_top_p_restricts_to_nucleus(self):
        # p(token) = [0.5, 0.3, 0.15, 0.05]: top_p=0.8 keeps {0, 1} (the
        # crossing token is included), 0.81 keeps {0, 1, 2}.
        logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]])).repeat(4000, 0)
        toks = np.asarray(sample_logits(jax.random.PRNGKey(4), logits,
                                        top_p=0.8))
        assert set(np.unique(toks)) == {0, 1}
        toks3 = np.asarray(sample_logits(jax.random.PRNGKey(4), logits,
                                         top_p=0.81))
        assert set(np.unique(toks3)) == {0, 1, 2}
        # renormalized ratios inside the nucleus are preserved (0.5/0.3)
        frac0 = float((toks == 0).mean())
        assert 0.57 < frac0 < 0.68  # 0.5/0.8 = 0.625
        # a tiny p always keeps exactly the argmax
        tiny = np.asarray(sample_logits(jax.random.PRNGKey(5), logits,
                                        top_p=1e-6))
        assert set(np.unique(tiny)) == {0}

    def test_kept_set_matches_numpy_oracle(self):
        """Randomized sweep of the truncation mask against an independent
        numpy re-derivation of the spec (sort desc -> softmax -> cumsum ->
        keep the prefix through the crossing token; top-k keeps the k
        largest; both intersect). Gaussian logits, so ties are
        measure-zero and the kept sets must match exactly.

        Runs under ``disable_jit``: every trial has unique shapes/static
        args, so jitted execution would mean 40 fresh XLA compiles (~3 min
        of pure compile time for ~ms of math); eager execution is
        numerically identical here."""
        from mlx_vae_tpu.ops.sampling import truncate_logits

        rng = np.random.default_rng(42)
        with jax.disable_jit():
            self._run_oracle_sweep(rng, truncate_logits)

    def _run_oracle_sweep(self, rng, truncate_logits):
        for trial in range(40):
            V = int(rng.integers(2, 90))
            B = int(rng.integers(1, 8))
            logits = rng.standard_normal((B, V)).astype(np.float32)
            top_k = int(rng.integers(0, V + 2))       # 0 and >V = disabled
            top_p = float(rng.uniform(0.05, 1.0)) if rng.random() < 0.8 else 1.0

            keep = np.ones((B, V), bool)
            if 0 < top_k < V:
                kth = np.sort(logits, axis=-1)[:, -top_k][:, None]
                keep &= logits >= kth
            if top_p < 1.0:
                masked = np.where(keep, logits, -np.inf)
                order = np.argsort(-masked, axis=-1)
                desc = np.take_along_axis(masked, order, axis=-1)
                e = np.exp(desc - desc.max(axis=-1, keepdims=True))
                probs = e / e.sum(axis=-1, keepdims=True)
                cum = np.cumsum(probs, axis=-1)
                kept_sorted = (cum - probs) < top_p
                nuc = np.zeros((B, V), bool)
                np.put_along_axis(nuc, order, kept_sorted, axis=-1)
                keep &= nuc

            out = np.asarray(truncate_logits(jnp.asarray(logits),
                                             top_k=top_k, top_p=top_p))
            np.testing.assert_array_equal(
                np.isfinite(out), keep,
                err_msg=f"trial={trial} V={V} top_k={top_k} top_p={top_p}")
            # surviving logits pass through unchanged
            np.testing.assert_array_equal(out[keep], logits[keep])

    def test_invalid_ranges_raise(self):
        """top_p = 0 would leave an empty support set (every token masked
        to -inf); negative top_k is always a caller bug. Both are static
        Python values, so they must fail fast host-side."""
        import pytest

        logits = jnp.zeros((4, 8))
        with pytest.raises(ValueError, match="top_p"):
            sample_logits(jax.random.PRNGKey(0), logits, top_p=0.0)
        with pytest.raises(ValueError, match="top_p"):
            sample_logits(jax.random.PRNGKey(0), logits, top_p=1.5)
        with pytest.raises(ValueError, match="top_k"):
            sample_logits(jax.random.PRNGKey(0), logits, top_k=-1)

    def test_defaults_are_bitwise_noops(self):
        logits = jax.random.normal(jax.random.PRNGKey(6), (256, 20))
        k = jax.random.PRNGKey(7)
        base = sample_logits(k, logits, temperature=1.3)
        explicit = sample_logits(k, logits, temperature=1.3, top_k=0,
                                 top_p=1.0)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(explicit))

    def test_top_k_and_top_p_intersect(self):
        # top_k=2 keeps {0, 1}; top_p then renormalizes over the truncated
        # row (p = [0.571, 0.429]): p=0.39 keeps only the crossing argmax
        # token {0}, p=0.95 keeps both.
        logits = jnp.log(jnp.asarray([[0.4, 0.3, 0.2, 0.1]])).repeat(2000, 0)
        toks = np.asarray(sample_logits(jax.random.PRNGKey(8), logits,
                                        top_k=2, top_p=0.39))
        assert set(np.unique(toks)) == {0}
        toks2 = np.asarray(sample_logits(jax.random.PRNGKey(8), logits,
                                         top_k=2, top_p=0.95))
        assert set(np.unique(toks2)) == {0, 1}

    def test_generate_top_k_one_matches_greedy(self, tiny_cfg):
        """Full AR rollout: top_k=1 leaves exactly one unmasked token per
        step, so the sampled trajectory must be bit-equal to greedy."""
        params, z, cond = _setup(tiny_cfg)
        g = generate_with_temperature(params, tiny_cfg, z, cond,
                                      jax.random.PRNGKey(9), max_length=20,
                                      greedy=True)
        k1 = generate_with_temperature(params, tiny_cfg, z, cond,
                                       jax.random.PRNGKey(10), max_length=20,
                                       temperature=2.0, top_k=1)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(k1))

    def test_truncation_stays_on_fused_kernel(self):
        """Truncated sampling runs IN-KERNEL (bisection masking) since r4:
        the gate admits top-k/top-p wherever it admits plain stochastic
        sampling — the former scan-fallback (27-53x slower) is gone."""
        from unittest import mock

        from mlx_vae_tpu.ops.pallas_decoder import pallas_generate_supported

        cfg = ModelConfig(hidden_dim=256, num_layers=2,
                          compute_dtype="float32")
        with mock.patch.object(jax, "default_backend", return_value="tpu"):
            assert pallas_generate_supported(cfg, 4096, greedy=False)
            assert pallas_generate_supported(cfg, 4096, greedy=False,
                                             top_k=5)
            assert pallas_generate_supported(cfg, 4096, greedy=False,
                                             top_p=0.9)
            # the scaled stochastic tier admits truncation too
            big = ModelConfig(hidden_dim=1024, latent_dim=512, num_layers=4,
                              embedding_dim=128, compute_dtype="bfloat16")
            assert pallas_generate_supported(big, 4096, greedy=False,
                                             top_k=5, top_p=0.9)

    def test_bisect_kept_set_matches_numpy_oracle(self):
        """`truncate_logits_bisect` (the Mosaic-lowerable sort-free variant
        the fused kernel runs per step) must keep exactly the same token
        set as `truncate_logits` / the numpy spec, including lane padding.
        Same sweep as test_kept_set_matches_numpy_oracle, run through a
        pad-to-128-lanes adapter."""
        from mlx_vae_tpu.ops.sampling import (_TRUNC_NEG,
                                              truncate_logits_bisect)

        def padded_bisect(logits, top_k=0, top_p=1.0):
            B, V = logits.shape
            Vp = 128
            # pad lanes mirror the kernel's -1e9 fc_out bias on pad columns
            padded = jnp.full((B, Vp), -1e9, jnp.float32)
            padded = padded.at[:, :V].set(logits)
            out = truncate_logits_bisect(padded, V, top_k=top_k, top_p=top_p)
            out = np.asarray(out)
            active = (top_k and 0 < top_k < V) or top_p < 1.0
            if active:
                # pad lanes must always be masked when truncation ran
                assert (out[:, V:] <= 0.5 * _TRUNC_NEG).all()
            sl = out[:, :V]
            return jnp.where(sl <= 0.5 * _TRUNC_NEG, -jnp.inf, sl)

        rng = np.random.default_rng(7)
        with jax.disable_jit():
            self._run_oracle_sweep(rng, padded_bisect)

    def test_bisect_tie_semantics_match(self):
        """Duplicate logit values: both truncators keep ALL ties of the
        kth/cutoff value (the `where(s < kth)` rule), never a subset."""
        from mlx_vae_tpu.ops.sampling import (_TRUNC_NEG, truncate_logits,
                                              truncate_logits_bisect)

        x = jnp.asarray([[1.0, 5.0, 5.0, 3.0, 5.0, 0.0]], jnp.float32)
        xp = jnp.full((1, 128), -1e9, jnp.float32).at[:, :6].set(x)
        for k in (1, 2, 3, 4, 5):
            ref = np.isfinite(np.asarray(truncate_logits(x, top_k=k)))
            got = (np.asarray(truncate_logits_bisect(xp, 6, top_k=k))[:, :6]
                   > 0.5 * _TRUNC_NEG)
            np.testing.assert_array_equal(ref, got, err_msg=f"top_k={k}")


def test_fused_greedy_gate_tiers():
    """Greedy fused-generation gate shape (ops/pallas_decoder.py): the
    probed envelope at H<=512 (dtype-independent n*H<=2048), H>512
    restricted to bf16 under the stochastic VMEM ceiling. The contract at
    every admitted corner is DISTRIBUTIONAL — measured in
    benchmarks/greedy_parity_probe.json; bit parity is a per-corner
    accident, not a tier. Gate logic is backend-independent apart from
    the TPU check, which we bypass here."""
    from unittest import mock

    import jax as _jax

    from mlx_vae_tpu.config import ModelConfig
    from mlx_vae_tpu.ops.pallas_decoder import pallas_generate_supported

    def gate(h, n, dt, greedy=True, **kw):
        cfg = ModelConfig(hidden_dim=h, num_layers=n, compute_dtype=dt, **kw)
        with mock.patch.object(_jax, "default_backend", return_value="tpu"):
            return pallas_generate_supported(cfg, 4096, greedy=greedy)

    # H <= 512 envelope: dtype-independent n*H <= 2048 (ADVICE r2)
    assert gate(512, 4, "float32")
    assert gate(512, 4, "bfloat16")
    assert gate(256, 8, "float32")
    assert not gate(512, 8, "float32")  # n*H = 4096 > 2048

    # distributional tier: H > 512 requires bf16 (and the VMEM ceiling)
    assert gate(1024, 4, "bfloat16")       # the scaled config, now fused
    assert gate(1024, 2, "bfloat16")
    assert not gate(1024, 4, "float32")    # f32 large-H never fused
    assert not gate(1024, 8, "bfloat16")   # resident set over 80MB

    # the H<=512 greedy envelope must ALSO respect the VMEM resident
    # budget — a huge vocab/embedding blows it even at a small H/n
    # (code-review r3: the early return used to skip the check)
    assert not gate(512, 2, "float32",
                    vocab_size=50000, embedding_dim=512)  # ~212MB resident
    assert gate(512, 2, "float32")          # default vocab still fused
