"""int8 quantized inference tail (engine/quant.py): integer-arithmetic
exactness, calibration correctness, float-tail fidelity, and the e2e
quantized clip path vs the bf16 fast path."""

import numpy as np
import jax
import jax.numpy as jnp

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.engine import init_state, build_clip_inference
from tecogan_tpu.engine.inference import build_quantized_clip_inference
from tecogan_tpu.engine.quant import (
    calibrate,
    quantize_tail,
    tail_features_int8,
    _conv_layers,
)
from tecogan_tpu.engine.state import model_defs

from conftest import cached_clip_inference


def small_cfg(**kw):
    base = dict(crop_size=8, num_resblock=2, precision="fp32",
                bug_parity=False, jit=True)
    base.update(kw)
    return TecoConfig(**base)


def _params(cfg, seed=0):
    return init_state(cfg, jax.random.PRNGKey(seed)).params_g


def test_calibrate_matches_float_tail(rng):
    """calibrate() must run the exact tail_features math while recording
    per-conv input maxima."""
    cfg = small_cfg()
    params = _params(cfg)
    gen, _ = model_defs(cfg)
    net = jnp.asarray(rng.random((1, 8, 8, 64)).astype(np.float32))
    feat_ref = gen.apply({"params": params}, net,
                         method=type(gen).tail_features)
    feat, maxes = calibrate(params, net)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(feat_ref),
                               atol=1e-6)
    assert set(maxes) == set(_conv_layers(params))
    assert all(float(m) > 0 for m in jax.tree_util.tree_leaves(maxes))
    # the first conv's input is net itself
    np.testing.assert_allclose(float(maxes["resblock_0/Conv_0"]),
                               float(jnp.max(jnp.abs(net))), rtol=1e-6)


def test_int8_conv_integer_exactness(rng):
    """The s8 x s8 -> s32 conv must be exact integer arithmetic: equal to
    the f32 conv over the dequantized integers."""
    cfg = small_cfg(num_resblock=1)
    params = _params(cfg)
    net = jnp.asarray((rng.random((1, 8, 8, 64)) * 2 - 1).astype(np.float32))
    _, maxes = calibrate(params, net)
    q = quantize_tail(params, maxes)
    l = q["resblock_0/Conv_0"]
    xq = jnp.clip(jnp.round(net * l["inv_s"]), -127, 127).astype(jnp.int8)
    y_int = jax.lax.conv_general_dilated(
        xq, l["wq"], (1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y_f = jax.lax.conv_general_dilated(
        xq.astype(jnp.float32), l["wq"].astype(jnp.float32), (1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_array_equal(np.asarray(y_int),
                                  np.asarray(y_f).astype(np.int64))


def test_quantized_tail_close_to_float(rng):
    """W8A8 with calibrated scales must track the float tail closely on
    in-calibration-range inputs."""
    cfg = small_cfg()
    params = _params(cfg)
    net = jnp.asarray(rng.random((1, 8, 8, 64)).astype(np.float32))
    feat_f, maxes = calibrate(params, net)
    q = quantize_tail(params, maxes)
    feat_q = tail_features_int8(params, q, net, compute_dtype=jnp.float32)
    f, g = np.asarray(feat_f), np.asarray(feat_q)
    rel = np.linalg.norm(f - g) / max(np.linalg.norm(f), 1e-9)
    assert rel < 0.05, f"relative L2 {rel}"


def test_quantized_clip_inference_vs_bf16(rng):
    """The e2e int8 clip path must run the full recurrence and stay close
    to the bf16 fast path (quantization error only)."""
    cfg = small_cfg()
    state = init_state(cfg, jax.random.PRNGKey(0))
    clip = jnp.asarray(rng.random((1, 6, 8, 8, 3)).astype(np.float32))

    sr_bf16 = np.asarray(cached_clip_inference(cfg)(state.params_g, clip))
    prepare, infer = build_quantized_clip_inference(cfg)
    qtail = prepare(state.params_g, clip, frames=4)
    sr_q = np.asarray(infer(state.params_g, qtail, clip))

    assert sr_q.shape == sr_bf16.shape == (1, 6, 32, 32, 3)
    assert sr_q.min() >= 0.0 and sr_q.max() <= 1.0
    mse = float(np.mean((sr_q - sr_bf16) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 35.0, f"int8 vs bf16 PSNR {psnr:.2f} dB"
    # int8 kernels really are int8 (serving artifact, not a simulation)
    assert all(l["wq"].dtype == jnp.int8 for l in qtail.values())


def test_quantized_chunked_matches_one_shot(rng):
    """The chunked streaming path with a qtail must be BIT-equal to the
    one-shot quantized path (same per-frame math, windows only change
    the schedule) — the CLI's long-clip --quantize int8 route."""
    from tecogan_tpu.engine.inference import build_chunked_inference

    cfg = small_cfg()
    state = init_state(cfg, jax.random.PRNGKey(0))
    clip = jnp.asarray(rng.random((1, 7, 8, 8, 3)).astype(np.float32))

    prepare, infer = build_quantized_clip_inference(cfg)
    qtail = prepare(state.params_g, clip, frames=4)
    sr_one = np.asarray(infer(state.params_g, qtail, clip))

    chunked = build_chunked_inference(cfg)
    sr_chunked = chunked(state.params_g, clip, chunk=3, qtail=qtail)
    assert sr_chunked.shape == sr_one.shape
    assert float(np.max(np.abs(sr_chunked - sr_one))) == 0.0


def test_dp_int8_matches_single_device(rng):
    """--quantize int8 through the DP inference path (VERDICT r3 Missing
    #4): clips sharded over the 8-CPU mesh with a replicated qtail must
    reproduce the single-device quantized output bit-for-bit."""
    from tecogan_tpu.parallel import (
        build_dp_quantized_inference, make_mesh, shard_batch,
    )
    from tecogan_tpu.parallel.mesh import replicated
    import jax as _jax

    cfg = small_cfg()
    state = init_state(cfg, jax.random.PRNGKey(0))
    clips = jnp.asarray(rng.random((8, 5, 8, 8, 3)).astype(np.float32))

    # single-device reference with the DP graph settings (per-stream
    # gather unroll off — the B>1 scheduling knob, same math)
    prepare, infer = build_quantized_clip_inference(
        cfg.replace(gather_unroll_streams=False))
    qtail = prepare(state.params_g, clips[:1], frames=4)
    sr_ref = np.asarray(infer(state.params_g, qtail, clips))

    mesh = make_mesh(8)
    prepare_dp, dp_infer = build_dp_quantized_inference(cfg, mesh)
    params_rep = _jax.device_put(state.params_g, replicated(mesh))
    sr_dp = np.asarray(dp_infer(params_rep, qtail, shard_batch(mesh, clips)))
    assert sr_dp.shape == sr_ref.shape == (8, 5, 32, 32, 3)
    assert float(np.max(np.abs(sr_dp - sr_ref))) == 0.0


def test_quantized_requires_fast_path():
    import pytest

    with pytest.raises(ValueError):
        build_quantized_clip_inference(small_cfg(bug_parity=True))
