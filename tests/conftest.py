"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
--xla_force_host_platform_device_count (SURVEY.md §4 "Implication for the
TPU build").  Must be set before jax initializes, hence module scope here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# keep tests hermetic: the CLIs enable the persistent compilation cache
# (config.enable_compilation_cache), which would write to ~/.cache
os.environ.setdefault("FASTDNN_COMPILE_CACHE", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize hook force-registers the TPU platform regardless of
# JAX_PLATFORMS; this explicit config update wins as long as it runs before
# the first backend use.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REFERENCE_DATA = "/root/reference/data"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1)


@pytest.fixture(scope="session")
def features_16khz():
    """Bundled binary features: header says 100 frames x 432 dims."""
    from fastdnn_tpu.formats.binary import read_features

    return read_features(os.path.join(REFERENCE_DATA, "16khz.bin"))


@pytest.fixture(scope="session")
def features_8khz():
    """Bundled aligned binary features: 389 frames x 432 dims."""
    from fastdnn_tpu.formats.binary import read_features

    return read_features(os.path.join(REFERENCE_DATA, "8khz.aligned.bin"))


@pytest.fixture(scope="session")
def small_net():
    """Small random net matching the bundled feature dims (432 input)."""
    import jax

    from fastdnn_tpu.models.feedforward import random_net

    return random_net(
        jax.random.PRNGKey(0), input_dim=432, hidden_widths=[256, 256, 256], output_dim=400
    )
