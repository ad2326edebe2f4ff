"""Test harness config.

Tests run on CPU with 8 fake devices
(``--xla_force_host_platform_device_count=8``, jax's standard mechanism for
exercising pjit/sharding without a TPU pod — SURVEY.md §4(e)). Must be set
before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import gc  # noqa: E402

import jax  # noqa: E402

# Plugin environments (e.g. the axon TPU terminal) force their platform via
# jax.config, which beats the env var — force CPU back explicitly.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from mlx_vae_tpu.config import ModelConfig  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (full tier, ~22 min; default skips "
             "them for a <10 min fast tier)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_programs_between_modules():
    """Clear jax's compiled-executable caches after each test module.

    One pytest process compiles thousands of XLA:CPU programs across the
    full tier; each live executable pins JIT code pages (several mmap'd
    VMAs apiece), and the process eventually exhausts ``vm.max_map_count``
    (default 65530) — LLVM's JIT then segfaults on the next big compile
    (observed deterministically in the --runslow tier's final module).
    Cross-module program reuse is nil, so the only cost is an occasional
    recompile of shared helpers.
    """
    yield
    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def tiny_cfg() -> ModelConfig:
    return ModelConfig(vocab_size=24, embedding_dim=16, hidden_dim=32,
                       latent_dim=8, num_conditions=1, num_layers=2)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


@pytest.fixture()
def key():
    return jax.random.PRNGKey(0)
