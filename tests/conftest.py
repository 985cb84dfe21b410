"""Test configuration.

Forces a hermetic 8-device virtual CPU platform for the whole test session.
This image's ``sitecustomize`` (PYTHONPATH=/root/.axon_site) registers a
remote-TPU PJRT plugin in every python process and imports jax early with
``JAX_PLATFORMS=axon``; tests must not depend on that relay, so we flip the
platform config *after* import but before any backend initialises, and add
the virtual-device flag so sharding tests run anywhere (a capability the
reference lacks — SURVEY.md §4).
"""

import os

import jax

jax.config.update('jax_platforms', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import yolact_tpu.utils.jax_setup  # noqa: E402,F401  (persistent XLA cache)


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
