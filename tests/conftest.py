"""Test harness: run everything on CPU with 8 virtual devices so the
data-parallel / mesh paths are exercised without TPU hardware
(SURVEY.md §4 test plan, item c).

Note: this image's sitecustomize registers a remote-TPU ('axon') PJRT
plugin at interpreter start and forces JAX_PLATFORMS=axon.  jax is already
imported by then, so plain env vars are too late — we must override via
jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
