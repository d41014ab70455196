"""Single-stream spatially-sharded inference (parallel/spatial.py).

The sharded program must reproduce the unsharded exact path
(engine/inference.build_clip_inference) — halo-exchanged convs are the
SAME convs, the transposed-conv phase decomposition is an equivalence,
and the warp all-gather is exact.  Run on the 8-virtual-CPU mesh
(conftest), mirroring how the DP tests validate collectives without
hardware (SURVEY.md §4 item c).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.engine import init_state
from tecogan_tpu.engine.inference import build_clip_inference
from tecogan_tpu.parallel.mesh import make_mesh
from tecogan_tpu.parallel.spatial import (
    build_spatial_clip_inference, spatial_input_sharding,
)


def _cfg(**kw):
    base = dict(precision="f32", num_resblock=2, bug_parity=False,
                use_pallas=False, crop_size=8)
    base.update(kw)
    return TecoConfig(**base)


def _clip(t=3, h=16, w=16):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random((1, t, h, w, 3), np.float32))


def test_spatial_matches_single_device():
    cfg = _cfg()
    pg = init_state(cfg, jax.random.PRNGKey(0)).params_g
    clip = _clip()
    ref = np.asarray(build_clip_inference(cfg)(pg, clip))
    mesh = make_mesh(n_data=8)
    out = np.asarray(build_spatial_clip_inference(cfg, mesh)(pg, clip))
    assert out.shape == ref.shape == (1, 3, 64, 64, 3)
    np.testing.assert_allclose(out, ref, atol=2e-6)


def test_spatial_matches_single_device_bug_parity():
    # parity_half grid rounding must shard identically (fp16 round-trip is
    # elementwise — rows are independent).
    cfg = _cfg(bug_parity=True)
    pg = init_state(cfg, jax.random.PRNGKey(1)).params_g
    clip = _clip()
    ref = np.asarray(build_clip_inference(cfg)(pg, clip))
    mesh = make_mesh(n_data=8)
    out = np.asarray(build_spatial_clip_inference(cfg, mesh)(pg, clip))
    np.testing.assert_allclose(out, ref, atol=2e-6)


def test_spatial_bf16_and_presharded_input():
    # the production dtype; inputs device_put row-sharded up front
    cfg = _cfg(precision="bf16")
    pg = init_state(cfg, jax.random.PRNGKey(2)).params_g
    clip = _clip(t=2, h=32, w=16)
    ref = np.asarray(build_clip_inference(cfg)(pg, clip))
    mesh = make_mesh(n_data=8)
    placed = jax.device_put(clip, spatial_input_sharding(mesh))
    out = np.asarray(build_spatial_clip_inference(cfg, mesh)(pg, placed))
    # bf16 conv reassociation across the halo split: ~1e-2 abs on [0,1]
    np.testing.assert_allclose(out, ref, atol=2e-2)
    assert float(np.abs(out - ref).mean()) < 2e-3


def test_spatial_rejects_bad_height():
    cfg = _cfg(jit=False)
    pg = init_state(cfg, jax.random.PRNGKey(0)).params_g
    mesh = make_mesh(n_data=8)
    with pytest.raises(ValueError, match="not divisible"):
        build_spatial_clip_inference(cfg, mesh)(pg, _clip(h=20))
