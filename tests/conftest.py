"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
paths run in CI without TPUs (SURVEY.md §4 rebuild strategy, item c)."""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# env-var JAX_PLATFORMS gets "axon" prepended by the site config in this image;
# the config.update path is authoritative and keeps CI off the tunneled TPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from furusato_recommend_tpu.config import Config  # noqa: E402
from furusato_recommend_tpu.data import synthetic_dataset  # noqa: E402


@pytest.fixture(scope="session")
def tiny_dataset():
    return synthetic_dataset(n_users=120, m_items=180, avg_degree=10, seed=7)


@pytest.fixture(scope="session")
def tiny_graph(tiny_dataset):
    return tiny_dataset.graph


@pytest.fixture(scope="session")
def tiny_config():
    return Config(
        model="mf",
        latent_dim=16,
        bpr_batch_size=256,
        lr=0.05,
        eval_user_batch=64,
        topks=(5, 10),
        epochs=5,
        test_span=5,
    )


@pytest.fixture(scope="session")
def item_categories(tiny_dataset):
    rng = np.random.default_rng(3)
    m = tiny_dataset.m_items
    cats = np.full((m, 4), -1, dtype=np.int32)
    for i in range(m):
        k = rng.integers(1, 4)
        cats[i, :k] = rng.choice(12, size=k, replace=False)
    return cats
