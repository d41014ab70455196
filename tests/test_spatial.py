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
from tecogan_tpu.parallel.mesh import make_mesh
from tecogan_tpu.parallel.spatial import (
    build_spatial_clip_inference, spatial_input_sharding,
)

from conftest import cached_clip_inference


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
    ref = np.asarray(cached_clip_inference(cfg)(pg, clip))
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
    ref = np.asarray(cached_clip_inference(cfg)(pg, clip))
    mesh = make_mesh(n_data=8)
    out = np.asarray(build_spatial_clip_inference(cfg, mesh)(pg, clip))
    np.testing.assert_allclose(out, ref, atol=2e-6)


def test_spatial_bf16_and_presharded_input():
    # the production dtype; inputs device_put row-sharded up front
    cfg = _cfg(precision="bf16")
    pg = init_state(cfg, jax.random.PRNGKey(2)).params_g
    clip = _clip(t=2, h=32, w=16)
    ref = np.asarray(cached_clip_inference(cfg)(pg, clip))
    mesh = make_mesh(n_data=8)
    placed = jax.device_put(clip, spatial_input_sharding(mesh))
    out = np.asarray(build_spatial_clip_inference(cfg, mesh)(pg, placed))
    # bf16 conv reassociation across the halo split: ~1e-2 abs on [0,1]
    np.testing.assert_allclose(out, ref, atol=2e-2)
    assert float(np.abs(out - ref).mean()) < 2e-3


def test_spatial_fused_matches_single_device_fused():
    """The PRODUCTION fast path sharded (VERDICT r4 Next #5): planar
    coords + packed-gather warp + identity-s2d first layer + s2d carry,
    row-sharded, must be bit-equal to build_clip_inference's fused path.
    n=3 shards exercise edge AND interior halo devices while keeping the
    1-core CPU-mesh cost down (every shard executes serially here)."""
    from tecogan_tpu.parallel.spatial import build_spatial_fused_clip_inference

    cfg = _cfg(precision="bf16", use_pallas=True, RNN_N=4)
    pg = init_state(cfg, jax.random.PRNGKey(0)).params_g
    clip = _clip(t=3, h=24, w=16)
    ref = np.asarray(cached_clip_inference(cfg)(pg, clip))
    out = np.asarray(
        build_spatial_fused_clip_inference(cfg, make_mesh(n_data=3))(pg, clip))
    assert out.shape == ref.shape == (1, 3, 96, 64, 3)
    np.testing.assert_array_equal(out, ref)


def test_spatial_fused_int8_matches_single_device_int8():
    """int8 W8A8 tail under spatial sharding (the r4 CLI warning is dead):
    per-layer scales are global scalars, so quantize-then-halo is the
    integer-exact sharding of the unsharded quantized conv."""
    from tecogan_tpu.engine.inference import build_quantized_clip_inference
    from tecogan_tpu.parallel.spatial import build_spatial_fused_clip_inference

    cfg = _cfg(precision="bf16", use_pallas=True, RNN_N=4)
    pg = init_state(cfg, jax.random.PRNGKey(0)).params_g
    clip = _clip(t=3, h=24, w=16)
    prepare, infer_q = build_quantized_clip_inference(cfg)
    qtail = prepare(pg, clip, frames=3)
    ref = np.asarray(infer_q(pg, qtail, clip))
    out = np.asarray(build_spatial_fused_clip_inference(
        cfg, make_mesh(n_data=3), quantize=True)(pg, qtail, clip))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.slow
def test_cli_routes_spatial_shards(tmp_path, capsys):
    # run_inference serves clips through the spatial path when
    # --spatial_shards > 1 (clamped to a divisor of the clip height)
    from tecogan_tpu.cli.main import run_inference
    from tecogan_tpu.data import write_synthetic_scene_folders
    from tecogan_tpu.engine import init_state
    from tecogan_tpu.utils.checkpoint import save_train_state

    data = str(tmp_path / "scenes")
    write_synthetic_scene_folders(data, num_scenes=1, frames_per_scene=6,
                                  size=32)
    cfg = _cfg(input_dir_LR=data, output_dir=str(tmp_path / "out"),
               spatial_shards=8, max_frm=5)
    state = init_state(cfg, jax.random.PRNGKey(0))
    save_train_state(cfg.output_dir, state, 0, async_save=False)
    cfg = cfg.replace(
        g_checkpoint=str(tmp_path / "out" / "generator.ckpt"))
    run_inference(cfg)
    outp = tmp_path / "out" / "output0.mp4"
    assert outp.exists()
    assert "spatial: 8-way row sharding" in capsys.readouterr().out


def test_spatial_rejects_bad_height():
    cfg = _cfg(jit=False)
    pg = init_state(cfg, jax.random.PRNGKey(0)).params_g
    mesh = make_mesh(n_data=8)
    with pytest.raises(ValueError, match="not divisible"):
        build_spatial_clip_inference(cfg, mesh)(pg, _clip(h=20))
