"""Loading checkpoints produced by the REFERENCE itself.

The reference writes ``np.savez`` of ``{epoch, encoder_weights,
decoder_weights, encoder_optimizer_state, decoder_optimizer_state, history}``
(``/root/reference/trainer.py:577-603``) where weights are MLX
``parameters()`` trees — the exact key names and array layouts this
framework deliberately shares — and optimizer states are MLX's layout
(per-leaf ``{"m", "v"}`` dicts + scalar ``step``/``learning_rate``). These
tests build such a checkpoint byte-for-byte the way the reference code does
(numpy leaves standing in for mx.arrays) and prove the migration paths:
direct ``load_checkpoint``, weights-only CLIs, and ``--resume``.
"""

import jax
import numpy as np
import pytest

from mlx_vae_tpu.config import ModelConfig
from mlx_vae_tpu.models.vae import ARCVAE
from mlx_vae_tpu.train.checkpoint import (_convert_mlx_optimizer_state,
                                          load_checkpoint)
from mlx_vae_tpu.utils.tree import tree_to_numpy

MCFG = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=32,
                   latent_dim=8, num_conditions=1, num_layers=2)


def _mlx_adam_state(params_np, step=7, lr=2e-4):
    """MLX ``optimizer.state``: mirrors the param tree with {m, v} leaves,
    plus scalar step/learning_rate entries (mlx.optimizers.Optimizer)."""
    rng = np.random.default_rng(0)

    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return {"m": rng.normal(0, 0.01, node.shape).astype(np.float32),
                "v": np.abs(rng.normal(0, 0.01, node.shape)).astype(np.float32)}

    state = walk(params_np)
    state["step"] = np.uint64(step)
    state["learning_rate"] = np.float32(lr)
    return state


def _write_reference_checkpoint(path, params_np, epoch=4):
    """Exactly what /root/reference/trainer.py:579-603 writes: the same
    dict keys through np.savez — no best_val_loss, no data stats, no
    predictor optimizer state."""
    checkpoint = {
        "epoch": epoch,
        "encoder_weights": params_np["encoder"],
        "decoder_weights": params_np["decoder"],
        "encoder_optimizer_state": _mlx_adam_state(params_np["encoder"]),
        "decoder_optimizer_state": _mlx_adam_state(params_np["decoder"]),
        # The reference's full 15-series history (trainer.py:84-100 — the
        # key set this framework shares verbatim, train/history.py).
        "history": {k: [float(5 - 0.1 * e) for e in range(epoch + 1)]
                    for k in ("epoch", "train_loss", "train_recon",
                              "train_kl", "train_collapse", "train_prop",
                              "val_loss", "val_recon", "val_kl",
                              "val_collapse", "val_prop", "beta",
                              "teacher_forcing", "learning_rate",
                              "mutual_info")},
    }
    np.savez(str(path), **checkpoint)
    return checkpoint


@pytest.fixture
def ref_ckpt(tmp_path):
    vae = ARCVAE(MCFG, jax.random.PRNGKey(3))
    params_np = tree_to_numpy(vae.params)
    path = tmp_path / "checkpoint_best.npz"
    written = _write_reference_checkpoint(path, params_np)
    return path, params_np, written


class TestLoadReferenceCheckpoint:
    def test_params_load_bitwise(self, ref_ckpt):
        path, params_np, _ = ref_ckpt
        loaded = load_checkpoint(path)
        assert loaded["epoch"] == 4
        assert loaded["best_val_loss"] == float("inf")  # key absent upstream
        for mod in ("encoder", "decoder"):
            flat_want = jax.tree_util.tree_leaves_with_path(params_np[mod])
            flat_got = dict(jax.tree_util.tree_leaves_with_path(
                loaded["params"][mod]))
            for keypath, want in flat_want:
                np.testing.assert_array_equal(np.asarray(flat_got[keypath]),
                                              want)

    def test_optimizer_state_converted(self, ref_ckpt):
        path, params_np, written = ref_ckpt
        loaded = load_checkpoint(path)
        for mod in ("encoder", "decoder"):
            st = loaded["opt_states"][mod]
            assert set(st) == {"step", "m", "v"}
            assert int(st["step"]) == 7
            # same tree structure as the params; every leaf = the mlx m/v
            mlx = written[f"{mod}_optimizer_state"]

            def check(node, got_m, got_v):
                for k, val in node.items():
                    if k in ("step", "learning_rate"):
                        continue
                    if {"m", "v"} <= set(val):
                        np.testing.assert_array_equal(np.asarray(got_m[k]),
                                                      val["m"])
                        np.testing.assert_array_equal(np.asarray(got_v[k]),
                                                      val["v"])
                    else:
                        check(val, got_m[k], got_v[k])

            check(mlx, st["m"], st["v"])
            assert (jax.tree_util.tree_structure(st["m"])
                    == jax.tree_util.tree_structure(loaded["params"][mod]))

    def test_own_format_not_misdetected(self, tmp_path):
        """A checkpoint written by THIS framework round-trips unchanged."""
        from mlx_vae_tpu.train.checkpoint import save_checkpoint
        from mlx_vae_tpu.train.optim import adam_init
        vae = ARCVAE(MCFG, jax.random.PRNGKey(4))
        opt = {k: adam_init(v) for k, v in vae.params.items()}
        p = tmp_path / "own.npz"
        save_checkpoint(p, 1, vae.params, opt, {})
        st = load_checkpoint(p)["opt_states"]["encoder"]
        assert set(st) == {"step", "m", "v"}
        assert int(st["step"]) == 0

    def test_converter_unit(self):
        state = {"step": np.uint64(11), "learning_rate": np.float32(1e-3),
                 "fc": {"weight": {"m": np.ones((2, 2)),
                                   "v": np.full((2, 2), 2.0)}}}
        out = _convert_mlx_optimizer_state(state)
        assert int(out["step"]) == 11
        assert "learning_rate" not in out
        np.testing.assert_array_equal(out["m"]["fc"]["weight"], 1.0)
        np.testing.assert_array_equal(out["v"]["fc"]["weight"], 2.0)


class TestMigrationCLIs:
    def test_generate_from_reference_checkpoint(self, ref_ckpt, tmp_path):
        """Weights-only migration: bulk generation straight from the
        reference's checkpoint_best.npz (stats come from --data since the
        reference embeds none)."""
        import json
        from mlx_vae_tpu.cli.generate import main
        from mlx_vae_tpu.data.prepare import make_synthetic_dataset
        path, _, _ = ref_ckpt
        d = tmp_path / "d.json"
        make_synthetic_dataset(n=120, vocab_size=24, max_length=16, seed=1,
                               path=str(d))
        out = tmp_path / "gen.json"
        main(["--checkpoint", str(path), "--data", str(d),
              "--num_molecules", "32", "--batch_size", "32",
              "--max_length", "12", "--target", "60", "--output", str(out)])
        with open(out) as f:
            g = json.load(f)
        assert np.asarray(g["tokens"]).shape == (32, 12)

    def test_resume_from_reference_checkpoint(self, ref_ckpt, tmp_path,
                                              monkeypatch):
        """--resume from a reference-produced checkpoint_best.npz: epoch
        offset honored, converted optimizer state accepted, training
        continues and saves our-format checkpoints."""
        from mlx_vae_tpu.cli.train import main
        from mlx_vae_tpu.data.prepare import make_synthetic_dataset
        path, _, _ = ref_ckpt
        monkeypatch.chdir(tmp_path)
        d = tmp_path / "d.json"
        make_synthetic_dataset(n=120, vocab_size=24, max_length=16, seed=2,
                               path=str(d))
        main(["--data", str(d), "--vocab_size", "24", "--embedding_dim", "16",
              "--hidden_dim", "32", "--latent_dim", "8", "--num_layers", "2",
              "--epochs", "6", "--batch_size", "32", "--resume",
              "--checkpoint_dir", str(tmp_path), "--checkpoint_freq", "1"])
        # epochs 5 and 6 ran (resume at ckpt epoch 4 + 1)
        assert (tmp_path / "checkpoint_epoch_005.npz").exists()
        resumed = load_checkpoint(tmp_path / "checkpoint_epoch_005.npz")
        assert resumed["epoch"] == 5
        # optimizer stepped on from the converted state
        assert int(resumed["opt_states"]["encoder"]["step"]) > 0
