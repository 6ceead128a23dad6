"""Test config: force an 8-device CPU platform (the TPU-world "fake backend"
for distributed logic — SURVEY.md §4) before any device is touched.

NOTE: the axon TPU plugin ignores the JAX_PLATFORMS env var in this image,
so the config must be set via jax.config at import time.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import os
import tempfile

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def synthetic_root():
    from epcnet_tpu.data import generate_synthetic_dataset

    root = tempfile.mkdtemp(prefix="epcnet_synth_")
    generate_synthetic_dataset(root, num_runs=3, submaps_per_run=30, num_points=128)
    return root


@pytest.fixture(scope="session")
def tiny_model_cfg():
    from epcnet_tpu.configs import ModelConfig

    return ModelConfig(
        num_points=128,
        knn_k=8,
        use_pallas=False,
        proxyconv_channels=(16, 16),
        lift_channels=(32, 64),
        feature_dim=64,
        vlad_clusters=8,
        vlad_groups=4,
        vlad_group_dim=16,
    )


@pytest.fixture(scope="session")
def mesh8():
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()).reshape(8)
    return Mesh(devs, ("db",))
