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

import functools

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# Session-cached program builders (VERDICT r4 Weak #5): the suite's cost is
# dominated by duplicate XLA compiles of near-identical programs.  Tests
# that build a step/inference fn from the SAME TecoConfig (frozen,
# hashable) share ONE jitted callable — jax then reuses the compiled
# executable across tests whenever the input shapes also match.  donate is
# forced off so cached callables never alias donated buffers.
# ---------------------------------------------------------------------------


def _cfg_cached(builder):
    # TecoConfig is a mutable dataclass (unhashable) — key on its repr,
    # which covers every field deterministically
    cache = {}

    @functools.wraps(builder)
    def wrapper(cfg):
        key = repr(cfg)
        if key not in cache:
            cache[key] = builder(cfg)
        return cache[key]

    return wrapper


@_cfg_cached
def cached_train_step(cfg):
    from tecogan_tpu.engine import build_train_step

    return build_train_step(cfg, donate=False)


@_cfg_cached
def cached_clip_inference(cfg):
    from tecogan_tpu.engine.inference import build_clip_inference

    return build_clip_inference(cfg)
