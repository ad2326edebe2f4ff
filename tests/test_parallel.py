"""Multi-device tests on the 8-fake-CPU-device mesh (SURVEY.md §4(e))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mlx_vae_tpu.config import ModelConfig, TrainConfig
from mlx_vae_tpu.data import MoleculeDataset
from mlx_vae_tpu.data.prepare import make_synthetic_dataset
from mlx_vae_tpu.models import ARCVAE
from mlx_vae_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_pspec,
    replicated_sharding,
    shard_params,
)
from mlx_vae_tpu.train.optim import adam_init
from mlx_vae_tpu.train.steps import train_step
from mlx_vae_tpu.train.trainer import ARCVAETrainer


requires_8 = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 (fake) devices")


@requires_8
def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh(model_parallel=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


def _tiny(with_batch=32):
    mcfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=32,
                       latent_dim=8, num_conditions=1, num_layers=2)
    tcfg = TrainConfig(batch_size=with_batch, learning_rate=1e-3)
    vae = ARCVAE(mcfg, jax.random.PRNGKey(0))
    x = jax.random.randint(jax.random.PRNGKey(1), (with_batch, 12), 0, 24)
    cond = jax.random.normal(jax.random.PRNGKey(2), (with_batch, 1))
    return mcfg, tcfg, vae, x, cond


@requires_8
def test_dp_train_step_matches_single_device():
    """The same jitted step, batch sharded over 8 devices vs unsharded,
    must produce (near) identical updated params — XLA inserts the grad
    all-reduce; semantics must not change."""
    mcfg, tcfg, vae, x, cond = _tiny(32)
    key = jax.random.PRNGKey(3)
    beta = jnp.float32(0.05)
    tf = jnp.float32(1.0)  # TF=1 -> no data-dependent argmax feedback

    params_a = jax.tree_util.tree_map(jnp.copy, vae.params)
    opt_a = {n: adam_init(p) for n, p in params_a.items()}
    pa, _, ma = train_step(params_a, opt_a, mcfg, tcfg, x, cond, key, beta, tf)

    mesh = make_mesh()
    sh_b = batch_sharding(mesh)
    sh_r = replicated_sharding(mesh)
    params_b = jax.device_put(jax.tree_util.tree_map(jnp.copy, vae.params), sh_r)
    opt_b = jax.device_put({n: adam_init(p) for n, p in params_b.items()}, sh_r)
    xb = jax.device_put(x, sh_b)
    condb = jax.device_put(cond, sh_b)
    pb, _, mb = train_step(params_b, opt_b, mcfg, tcfg, xb, condb, key, beta, tf)

    assert abs(float(ma["total_loss"]) - float(mb["total_loss"])) < 1e-4
    for la, lb in zip(jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-4, atol=2e-5)


@requires_8
def test_model_parallel_sharding_compiles_and_runs():
    """2D mesh (data=4, model=2): vocab-facing params sharded on 'model',
    batch on 'data'; the jitted step must compile and produce finite loss."""
    mcfg, tcfg, vae, x, cond = _tiny(32)
    mesh = make_mesh(model_parallel=2)
    params = shard_params(mesh, vae.params, model_parallel=True)
    opt = shard_params(mesh, {n: adam_init(p) for n, p in params.items()},
                       model_parallel=True)
    xb = jax.device_put(x, batch_sharding(mesh))
    condb = jax.device_put(cond, batch_sharding(mesh))
    p, o, m = train_step(params, opt, mcfg, tcfg, xb, condb,
                         jax.random.PRNGKey(3), jnp.float32(0.05), jnp.float32(1.0))
    assert np.isfinite(float(m["total_loss"]))


def test_param_pspec_rules():
    from jax.tree_util import GetAttrKey, DictKey
    assert param_pspec((DictKey("fc_out"), DictKey("weight"))) == P("model", None)
    assert param_pspec((DictKey("lstm_layer_0"), DictKey("Wx"))) == P("model", None)
    assert param_pspec((DictKey("fc_mu"), DictKey("weight"))) == P()


@requires_8
def test_data_parallel_generation_matches_single_device():
    """Greedy generation sharded over 8 devices must concatenate to exactly
    the single-device output (z drawn globally, sharded afterwards)."""
    from mlx_vae_tpu.cli.generate import make_generate_fn
    from mlx_vae_tpu.models import init_decoder_params

    mcfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=32,
                       latent_dim=8, num_conditions=1, num_layers=2)
    dec = init_decoder_params(jax.random.PRNGKey(0), mcfg)
    B, L = 32, 10
    z = jax.random.normal(jax.random.PRNGKey(1), (B, mcfg.latent_dim))
    cond = jax.random.normal(jax.random.PRNGKey(2), (B, 1)).astype(jnp.float32)
    key = jax.random.PRNGKey(3)

    single = make_generate_fn(mcfg, dec, False, L, 1.0, True, mesh=None)
    ref = np.asarray(single(z, cond, key))

    mesh = make_mesh()
    sharded_fn = make_generate_fn(mcfg, dec, False, L, 1.0, True, mesh=mesh)
    zs = jax.device_put(z, batch_sharding(mesh))
    cs = jax.device_put(cond, batch_sharding(mesh))
    got = sharded_fn(zs, cs, key)
    assert len(got.addressable_shards) == 8  # actually sharded
    np.testing.assert_array_equal(np.asarray(got), ref)


@pytest.mark.slow
def test_dryrun_multichip_self_provisions_from_single_device():
    """Regression for the round-1 driver failure: ``dryrun_multichip(8)``
    called from a process whose backend has ONE device must re-exec itself
    on a virtual 8-device CPU backend and pass (VERDICT.md item 1)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # Parent sees exactly one CPU device (strip any forced device count).
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    env.pop("MLX_VAE_TPU_DRYRUN_CHILD", None)
    code = (f"import sys; sys.path.insert(0, {repo!r}); "
            "import jax; assert len(jax.devices()) == 1, jax.devices(); "
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8)")
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8)" in proc.stdout and "OK" in proc.stdout


@requires_8
def test_data_parallel_trainer_epoch(tmp_path):
    make_synthetic_dataset(n=320, vocab_size=24, max_length=12,
                           path=str(tmp_path / "d.json"))
    from mlx_vae_tpu.data.split import load_and_split
    train_ds, val_ds, _, _ = load_and_split(str(tmp_path / "d.json"))
    mcfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=32,
                       latent_dim=8, num_conditions=1, num_layers=2)
    tcfg = TrainConfig(epochs=1, batch_size=32, data_parallel=True,
                       true_loss_batches=2, checkpoint_dir=str(tmp_path / "c"))
    vae = ARCVAE(mcfg, jax.random.PRNGKey(0))
    trainer = ARCVAETrainer(vae.params, mcfg, tcfg, train_ds)
    assert trainer.mesh is not None
    m = trainer.train_epoch(0, 1, val_dataset=val_ds)
    assert np.isfinite(m["train_loss"]) and np.isfinite(m["val_loss"])


@requires_8
def test_mesh_undersized_eval_reports_inf_not_zero(tmp_path):
    """A val split smaller than one batch cannot shard over the mesh; its
    loss must report +inf (never selectable as best), NOT 0.0 — a zero
    would freeze checkpoint_best on untrained weights (code-review r3)."""
    make_synthetic_dataset(n=320, vocab_size=24, max_length=12,
                           path=str(tmp_path / "d.json"))
    from mlx_vae_tpu.data.split import load_and_split
    train_ds, val_ds, _, _ = load_and_split(str(tmp_path / "d.json"))
    assert len(val_ds) == 32
    mcfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=32,
                       latent_dim=8, num_conditions=1, num_layers=2)
    tcfg = TrainConfig(epochs=1, batch_size=64, data_parallel=True,
                       true_loss_batches=2,
                       checkpoint_dir=str(tmp_path / "c"))
    vae = ARCVAE(mcfg, jax.random.PRNGKey(0))
    trainer = ARCVAETrainer(vae.params, mcfg, tcfg, train_ds)
    m = trainer._eval_batches(val_ds, 0.05, None, "Validating")
    # EVERY metric is a --best_metric candidate; all must carry the +inf
    # sentinel (a 0.0 recon would freeze --best_metric val_recon the same
    # way a 0.0 loss froze val_loss).
    for k, v in m.items():
        assert v == float("inf"), (k, v)


@pytest.mark.slow
@requires_8
def test_mesh_device_feed_matches_host_feed(tmp_path):
    """Under the 8-device mesh, the gather-fed shard_map path (replicated
    device-resident corpus + local [B/n] index slices) must be numerically
    IDENTICAL to host feeding: same shuffle RNG, same per-shard rows, same
    fold_in keys — bit-equal train/val losses over 2 epochs (VERDICT r2
    item 3)."""
    make_synthetic_dataset(n=320, vocab_size=24, max_length=12,
                           path=str(tmp_path / "d.json"))
    from mlx_vae_tpu.data.split import load_and_split
    train_ds, val_ds, _, _ = load_and_split(str(tmp_path / "d.json"))
    mcfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=32,
                       latent_dim=8, num_conditions=1, num_layers=2)
    results = {}
    for host in (False, True):
        tcfg = TrainConfig(epochs=2, batch_size=32, learning_rate=3e-3,
                           data_parallel=True, host_data=host,
                           true_loss_batches=3,
                           checkpoint_dir=str(tmp_path / f"ck_hd{int(host)}"))
        vae = ARCVAE(mcfg, jax.random.PRNGKey(11))
        trainer = ARCVAETrainer(vae.params, mcfg, tcfg, train_ds)
        assert trainer.mesh is not None
        assert trainer._device_data is (not host)
        ms = [trainer.train_epoch(e, 2, val_dataset=val_ds) for e in range(2)]
        results[host] = [(m["train_loss"], m["val_loss"]) for m in ms]
    assert results[False] == results[True]


@pytest.mark.slow
@requires_8
def test_mesh_device_feed_k4_dispatch(tmp_path):
    """K=4 fused gather dispatch under the mesh (the r2 ``K = 1 if mesh``
    restriction, lifted): runs the shmap multi-gather step, trains to a
    loss close to the K=1 run, and keeps params replicated."""
    make_synthetic_dataset(n=320, vocab_size=24, max_length=12,
                           path=str(tmp_path / "d.json"))
    from mlx_vae_tpu.data.split import load_and_split
    train_ds, _, _, _ = load_and_split(str(tmp_path / "d.json"))
    mcfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=32,
                       latent_dim=8, num_conditions=1, num_layers=2)
    losses = {}
    for k in (1, 4):
        tcfg = TrainConfig(epochs=2, batch_size=32, learning_rate=3e-3,
                           data_parallel=True, steps_per_dispatch=k,
                           true_loss_batches=3,
                           checkpoint_dir=str(tmp_path / f"ck_k{k}"))
        vae = ARCVAE(mcfg, jax.random.PRNGKey(7))
        trainer = ARCVAETrainer(vae.params, mcfg, tcfg, train_ds)
        trainer.train_epoch(0, 2, val_dataset=None)
        losses[k] = trainer.train_epoch(1, 2, val_dataset=None)["train_loss"]
        w = trainer.params["decoder"]["fc_out"]["weight"]
        shards = [np.asarray(s.data) for s in w.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(s, shards[0])
    # same data/init/schedule; only PRNG batching differs (scan splits keys)
    assert abs(losses[1] - losses[4]) / losses[1] < 0.2


@pytest.mark.slow
@requires_8
def test_model_parallel_trainer_epoch_matches_single_device(tmp_path):
    """tp=2 end-to-end (VERDICT r2 item 4): a trainer built with
    ``model_parallel=2`` forms the 4x2 mesh, shards embedding/fc_out/gate
    matrices on 'model', and — because the GSPMD path reuses the plain
    jitted steps with identical PRNG — reproduces the single-device run's
    losses to numerical tolerance."""
    make_synthetic_dataset(n=320, vocab_size=24, max_length=12,
                           path=str(tmp_path / "d.json"))
    from mlx_vae_tpu.data.split import load_and_split
    train_ds, val_ds, _, _ = load_and_split(str(tmp_path / "d.json"))
    mcfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=32,
                       latent_dim=8, num_conditions=1, num_layers=2)
    results = {}
    for tp in (1, 2):
        tcfg = TrainConfig(epochs=2, batch_size=32, learning_rate=3e-3,
                           model_parallel=tp, data_parallel=tp > 1,
                           true_loss_batches=3,
                           checkpoint_dir=str(tmp_path / f"ck_tp{tp}"))
        vae = ARCVAE(mcfg, jax.random.PRNGKey(5))
        trainer = ARCVAETrainer(vae.params, mcfg, tcfg, train_ds,
                                seed=123)
        if tp == 2:
            assert trainer.mesh is not None and trainer._gspmd
            assert dict(trainer.mesh.shape) == {"data": 4, "model": 2}
            emb = trainer.params["decoder"]["embedding"]["weight"]
            assert len({s.index for s in emb.addressable_shards}) == 2
        else:
            assert trainer.mesh is None
        ms = [trainer.train_epoch(e, 2, val_dataset=val_ds)
              for e in range(2)]
        results[tp] = ms
        # checkpoint roundtrip with model-sharded params: save gathers the
        # shards, load re-shards onto the mesh
        trainer.save_checkpoint(1, is_best=True, best_val_loss=ms[-1]["val_loss"])
        trainer.join_saves()
        w_before = np.asarray(trainer.params["decoder"]["fc_out"]["weight"])
        trainer.load_checkpoint(
            str(tmp_path / f"ck_tp{tp}" / "checkpoint_best.npz"))
        np.testing.assert_array_equal(
            np.asarray(trainer.params["decoder"]["fc_out"]["weight"]),
            w_before)
        if tp == 2:
            emb = trainer.params["decoder"]["embedding"]["weight"]
            assert len({s.index for s in emb.addressable_shards}) == 2
    for m1, m2 in zip(results[1], results[2]):
        for k in ("train_loss", "val_loss", "train_recon", "train_kl"):
            np.testing.assert_allclose(m1[k], m2[k], rtol=5e-4, atol=1e-5)


@requires_8
def test_model_parallel_alone_is_pure_tp(tmp_path):
    """``model_parallel=2`` WITHOUT ``data_parallel`` must build a pure
    (1, 2) mesh over two devices — not silently data-shard the batch over
    the remaining devices (code-review r3). A batch size indivisible by
    the would-be data axis (24 % 4 != 0) must therefore be accepted, and
    because the data axis is 1 (nothing splits the batch), PARTIAL batches
    must run rather than be dropped: the 9-sample val split below is
    smaller than batch_size, so dropping it would starve validation to the
    +inf sentinel and checkpoint_best would never be written
    (code-review r3 ×2)."""
    make_synthetic_dataset(n=96, vocab_size=24, max_length=12,
                           path=str(tmp_path / "d.json"))
    from mlx_vae_tpu.data.split import load_and_split
    train_ds, val_ds, _, _ = load_and_split(str(tmp_path / "d.json"))
    assert 0 < len(val_ds) < 24  # the partial-batch-only split
    mcfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=32,
                       latent_dim=8, num_conditions=1, num_layers=2)
    tcfg = TrainConfig(epochs=1, batch_size=24, learning_rate=3e-3,
                       model_parallel=2, data_parallel=False,
                       true_loss_batches=1,
                       checkpoint_dir=str(tmp_path / "ck"))
    vae = ARCVAE(mcfg, jax.random.PRNGKey(5))
    trainer = ARCVAETrainer(vae.params, mcfg, tcfg, train_ds, seed=123)
    assert dict(trainer.mesh.shape) == {"data": 1, "model": 2}
    assert len(trainer.mesh.devices.flatten()) == 2
    assert trainer._drop_partial is False
    m = trainer.train_epoch(0, 1, val_dataset=val_ds)
    assert np.isfinite(m["train_loss"])
    assert np.isfinite(m["val_loss"])  # partial val batch ran, not +inf


def test_model_parallel_rejects_pallas():
    """tp>1 + use_pallas is a configuration error (the fused kernels have
    no partitioning rule for model-sharded operands)."""
    if jax.device_count() < 2:
        pytest.skip("needs >1 device")
    mcfg = ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=32,
                       latent_dim=8, num_conditions=1, num_layers=2,
                       use_pallas=True)
    tcfg = TrainConfig(batch_size=32, model_parallel=2)
    vae = ARCVAE(mcfg.replace(use_pallas=False), jax.random.PRNGKey(0))
    ds = MoleculeDataset(np.zeros((64, 12), np.int32), np.zeros((64, 1)), 12)
    with pytest.raises(ValueError, match="use_pallas"):
        ARCVAETrainer(vae.params, mcfg, tcfg, ds)


@requires_8
def test_shmap_train_step_replicated_and_finite():
    """shard_map SPMD step: loss finite, updated params identical on every
    device (replicated after the pmean'd update)."""
    from mlx_vae_tpu.train.steps import make_shmap_train_step
    mcfg, tcfg, vae, x, cond = _tiny(32)
    mesh = make_mesh()
    step = make_shmap_train_step(mesh, mcfg, tcfg)
    # snapshot before the step: the donated input may alias these buffers
    w_before = np.asarray(vae.params["decoder"]["fc_out"]["weight"]).copy()
    params = jax.device_put(vae.params, replicated_sharding(mesh))
    opt = jax.device_put({n: adam_init(p) for n, p in params.items()},
                         replicated_sharding(mesh))
    xb = jax.device_put(x, batch_sharding(mesh))
    condb = jax.device_put(cond, batch_sharding(mesh))
    newp, newo, m = step(params, opt, xb, condb, jax.random.PRNGKey(0),
                         jnp.float32(0.05), jnp.float32(0.9))
    assert np.isfinite(float(m["total_loss"]))
    w = newp["decoder"]["fc_out"]["weight"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(s, shards[0])
    # params actually moved
    assert float(jnp.abs(w - w_before).max()) > 0


@pytest.mark.slow
@requires_8
def test_scaled_dims_shard_map_paths():
    """The gather-fed shard_map train step, the shard_map eval step, and
    sharded generation at the BASELINE scaled dims (hidden 1024, latent
    512, 4 layers, 3 conditions) — the production multi-chip paths at a
    shape where partitioned dimensions are real (VERDICT r4 weak #7; the
    tiny-dim tests above cannot catch shape-dependent sharding bugs).
    Mirrors ``__graft_entry__.dryrun_multichip`` tier 5b-5d."""
    from mlx_vae_tpu.cli.generate import make_generate_fn
    from mlx_vae_tpu.train.steps import (make_shmap_eval_step,
                                         make_shmap_train_step_gather)

    mcfg = ModelConfig(vocab_size=128, embedding_dim=128, hidden_dim=1024,
                       latent_dim=512, num_conditions=3, num_layers=4)
    n = 8
    tcfg = TrainConfig(batch_size=n)
    vae = ARCVAE(mcfg, jax.random.PRNGKey(0), with_predictor=True)
    mesh = make_mesh()
    repl = replicated_sharding(mesh)
    params = jax.device_put(vae.params, repl)
    opt = jax.device_put({k: adam_init(p) for k, p in params.items()}, repl)

    rng = np.random.default_rng(0)
    L = 8
    corpus_n = 4 * n
    toks = jax.device_put(
        jnp.asarray(rng.integers(0, mcfg.vocab_size, (corpus_n, L)),
                    jnp.int32), repl)
    props = jax.device_put(
        jnp.asarray(rng.normal(size=(corpus_n, mcfg.num_conditions)),
                    jnp.float32), repl)
    idx = jax.device_put(jnp.asarray(rng.permutation(corpus_n)[:n],
                                     jnp.int32),
                         NamedSharding(mesh, P("data")))

    gstep = make_shmap_train_step_gather(mesh, mcfg, tcfg)
    params, opt, gm = gstep(params, opt, toks, props, idx,
                            jax.random.PRNGKey(1), jnp.float32(0.05),
                            jnp.float32(0.9))
    assert np.isfinite(float(gm["total_loss"]))
    # updated params stay replicated bit-identically across shards
    w = params["decoder"]["fc_out"]["weight"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(s, shards[0])

    x = jax.device_put(
        jnp.asarray(rng.integers(0, mcfg.vocab_size, (n, L)), jnp.int32),
        NamedSharding(mesh, P("data")))
    cond = jax.device_put(
        jnp.asarray(rng.normal(size=(n, mcfg.num_conditions)), jnp.float32),
        NamedSharding(mesh, P("data")))
    em = make_shmap_eval_step(mesh, mcfg, tcfg)(
        params, x, cond, jax.random.PRNGKey(2), jnp.float32(0.05),
        jnp.float32(0.0))
    assert np.isfinite(float(em["total_loss"]))

    gen = make_generate_fn(mcfg, params["decoder"], False, L, 1.0, True,
                           mesh=mesh)
    z = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(3), (n, mcfg.latent_dim)),
        NamedSharding(mesh, P("data")))
    out = jax.block_until_ready(gen(z, cond, jax.random.PRNGKey(4)))
    assert out.shape == (n, L)
    assert int(out.max()) < mcfg.vocab_size
