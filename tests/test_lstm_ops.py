import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_vae_tpu.ops.lstm import init_lstm_params, lstm_cell, lstm_gates, lstm_sequence


def _ref_cell(params, x, h, c):
    """Straight-line numpy reference of the (i, f, g, o) LSTM cell."""
    gates = x @ np.asarray(params["Wx"]).T + h @ np.asarray(params["Wh"]).T \
        + np.asarray(params["bias"])
    H = h.shape[-1]
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    i, f, g, o = gates[:, :H], gates[:, H:2*H], gates[:, 2*H:3*H], gates[:, 3*H:]
    c_new = sig(f) * c + sig(i) * np.tanh(g)
    h_new = sig(o) * np.tanh(c_new)
    return h_new, c_new


def test_cell_matches_reference_math(key):
    params = init_lstm_params(key, 8, 16)
    x = np.random.default_rng(1).normal(size=(4, 8)).astype(np.float32)
    h = np.random.default_rng(2).normal(size=(4, 16)).astype(np.float32)
    c = np.random.default_rng(3).normal(size=(4, 16)).astype(np.float32)
    h1, c1 = lstm_cell(params, jnp.asarray(x), jnp.asarray(h), jnp.asarray(c))
    h2, c2 = _ref_cell(params, x, h, c)
    np.testing.assert_allclose(np.asarray(h1), h2, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), c2, rtol=1e-5, atol=1e-5)


def test_sequence_equals_unrolled_cells(key):
    params = init_lstm_params(key, 8, 16)
    B, L = 3, 7
    xs = jax.random.normal(jax.random.PRNGKey(5), (B, L, 8))
    h = jnp.zeros((B, 16))
    c = jnp.zeros((B, 16))
    outs, (hf, cf) = lstm_sequence(params, xs, h, c)
    # unrolled
    hs = []
    for t in range(L):
        h, c = lstm_cell(params, xs[:, t], h, c)
        hs.append(h)
    expected = jnp.stack(hs, axis=1)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(hs[-1]), rtol=1e-5, atol=1e-5)


def test_sequence_grads_flow(key):
    params = init_lstm_params(key, 4, 8)
    xs = jax.random.normal(jax.random.PRNGKey(6), (2, 5, 4))

    def loss(p):
        outs, _ = lstm_sequence(p, xs, jnp.zeros((2, 8)), jnp.zeros((2, 8)))
        return jnp.sum(outs ** 2)

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert float(jnp.abs(g["Wh"]).max()) > 0.0


def test_gates_shapes():
    gates = jnp.zeros((4, 64))
    c = jnp.ones((4, 16))
    h_new, c_new = lstm_gates(gates, c)
    assert h_new.shape == (4, 16) and c_new.shape == (4, 16)
    # zero gates: sigmoid=0.5, tanh(0)=0 -> c' = 0.5*c
    np.testing.assert_allclose(np.asarray(c_new), 0.5 * np.ones((4, 16)), rtol=1e-6)


class TestCustomVJP:
    def test_forward_matches_scan(self, key):
        from mlx_vae_tpu.ops.lstm import lstm_sequence_cv
        params = init_lstm_params(key, 8, 16)
        xs = jax.random.normal(jax.random.PRNGKey(5), (3, 7, 8))
        h0 = c0 = jnp.zeros((3, 16))
        a, (ha, ca) = lstm_sequence(params, xs, h0, c0)
        b, (hb, cb) = lstm_sequence_cv(params, xs, h0, c0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ca), np.asarray(cb), rtol=1e-5, atol=1e-6)

    def test_gradients_match_autodiff(self, key):
        """Hand-written backward == autodiff backward (f32, all inputs)."""
        from mlx_vae_tpu.ops.lstm import lstm_sequence_cv
        params = init_lstm_params(key, 8, 16)
        xs = jax.random.normal(jax.random.PRNGKey(6), (3, 7, 8))
        h0 = jax.random.normal(jax.random.PRNGKey(7), (3, 16)) * 0.1
        c0 = jax.random.normal(jax.random.PRNGKey(8), (3, 16)) * 0.1
        # loss touches hs, h_final and c_final with distinct weights
        def loss(fn):
            def f(p, x, h, c):
                hs, (hf, cf) = fn(p, x, h, c)
                return (jnp.sum(hs * 1.3) + jnp.sum(hf * 0.7)
                        + jnp.sum(cf * 0.3))
            return f
        g1 = jax.grad(loss(lstm_sequence), argnums=(0, 1, 2, 3))(params, xs, h0, c0)
        g2 = jax.grad(loss(lstm_sequence_cv), argnums=(0, 1, 2, 3))(params, xs, h0, c0)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)
