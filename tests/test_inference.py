"""Inference engine tests: scan vs streaming equivalence, shape
polymorphism, and equivalence with the training-engine unroll."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.engine import (
    init_state,
    build_clip_inference,
    build_stream_inference,
)
from tecogan_tpu.engine.losses import generator_unroll
from tecogan_tpu.engine.state import model_defs

from conftest import cached_clip_inference


def small_cfg(**kw):
    base = dict(crop_size=8, num_resblock=2, precision="fp32", jit=True)
    base.update(kw)
    return TecoConfig(**base)


def test_clip_inference_shapes(rng):
    cfg = small_cfg()
    state = init_state(cfg, jax.random.PRNGKey(0))
    infer = cached_clip_inference(cfg)
    clip = jnp.asarray(rng.random((2, 5, 8, 8, 3)).astype(np.float32))
    sr = infer(state.params_g, clip)
    assert sr.shape == (2, 5, 32, 32, 3)
    assert float(sr.min()) >= 0.0 and float(sr.max()) <= 1.0


def test_clip_inference_nonsquare(rng):
    """The generator trunk is fully convolutional: arbitrary H/W must work
    (the reference squeezes everything square — main.py:156 — but the 4x
    path itself is shape-agnostic)."""
    cfg = small_cfg()
    state = init_state(cfg, jax.random.PRNGKey(0))
    infer = cached_clip_inference(cfg)
    clip = jnp.asarray(rng.random((1, 3, 6, 10, 3)).astype(np.float32))
    sr = infer(state.params_g, clip)
    assert sr.shape == (1, 3, 24, 40, 3)


def test_stream_matches_scan(rng):
    cfg = small_cfg()
    state = init_state(cfg, jax.random.PRNGKey(0))
    infer = cached_clip_inference(cfg)
    init_fn, step = build_stream_inference(cfg)

    clip = jnp.asarray(rng.random((1, 6, 8, 8, 3)).astype(np.float32))
    sr = infer(state.params_g, clip)

    s = init_fn((1, 8, 8, 3))
    outs = []
    for t in range(6):
        s, frame = step(state.params_g, s, clip[:, t])
        outs.append(np.asarray(frame))
    np.testing.assert_allclose(
        np.stack(outs, axis=1), np.asarray(sr), atol=1e-6
    )


def test_stream_matches_scan_fused(rng):
    """The streaming step must run the SAME fused s2d fast path as the
    scan when bug_parity=False (serving: webcam/live per-frame latency
    gets the 38-fps path, not the reference-shaped one) — bit-equal."""
    cfg = small_cfg(bug_parity=False)
    state = init_state(cfg, jax.random.PRNGKey(0))
    infer = cached_clip_inference(cfg)
    init_fn, step = build_stream_inference(cfg)

    clip = jnp.asarray(rng.random((1, 6, 8, 8, 3)).astype(np.float32))
    sr = infer(state.params_g, clip)

    s = init_fn((1, 8, 8, 3))
    assert s.prev_sr.shape == (1, 8, 8, 48)  # s2d-layout carry
    outs = []
    for t in range(6):
        s, frame = step(state.params_g, s, clip[:, t])
        outs.append(np.asarray(frame))
    assert float(np.max(np.abs(np.stack(outs, axis=1) - np.asarray(sr)))) == 0.0


def test_stream_matches_scan_fused_nhwc(rng):
    """The warp_group != 4 fused fallback (NHWC carry) stream must also
    match its scan path bit-for-bit."""
    cfg = small_cfg(bug_parity=False, warp_group=2)
    state = init_state(cfg, jax.random.PRNGKey(0))
    infer = cached_clip_inference(cfg)
    init_fn, step = build_stream_inference(cfg)

    clip = jnp.asarray(rng.random((1, 4, 8, 8, 3)).astype(np.float32))
    sr = infer(state.params_g, clip)

    s = init_fn((1, 8, 8, 3))
    assert s.prev_sr.shape == (1, 32, 32, 3)  # NHWC carry
    outs = []
    for t in range(4):
        s, frame = step(state.params_g, s, clip[:, t])
        outs.append(np.asarray(frame))
    assert float(np.max(np.abs(np.stack(outs, axis=1) - np.asarray(sr)))) == 0.0


def test_inference_matches_training_unroll(rng):
    """The inference scan must produce the same frames as the training
    engine's unroll (same recurrence: main.py:173-216 vs train.py:86-111)."""
    cfg = small_cfg(RNN_N=5, bug_parity=True)
    state = init_state(cfg, jax.random.PRNGKey(0))
    gen, _ = model_defs(cfg)

    clip_nhwc = jnp.asarray(rng.random((2, 5, 8, 8, 3)).astype(np.float32))
    clip_nchw = jnp.transpose(clip_nhwc, (0, 1, 4, 2, 3))

    infer = cached_clip_inference(cfg)
    sr_inf = infer(state.params_g, clip_nhwc)  # (B,T,4H,4W,3)

    unroll = generator_unroll(gen, state.params_g, clip_nchw, cfg)
    sr_train = jnp.transpose(unroll.gen_outputs, (0, 1, 3, 4, 2))
    np.testing.assert_allclose(
        np.asarray(sr_inf), np.asarray(sr_train), atol=1e-5
    )


def test_chunked_matches_one_shot_exact_path(rng):
    """Chunked streaming inference (device memory O(window)) must equal
    the one-shot scan — same per-frame math, state carried across window
    boundaries.  Covers partial final windows (T=11 with chunk 4)."""
    from tecogan_tpu.engine import build_chunked_inference

    cfg = small_cfg()
    state = init_state(cfg, jax.random.PRNGKey(0))
    clip = jnp.asarray(rng.random((2, 11, 8, 8, 3)).astype(np.float32))
    one_shot = np.asarray(cached_clip_inference(cfg)(state.params_g, clip))
    chunked = build_chunked_inference(cfg)(state.params_g, clip, chunk=4)
    assert chunked.shape == one_shot.shape
    np.testing.assert_allclose(chunked, one_shot, atol=1e-6)


def test_chunked_matches_one_shot_fused_path(rng):
    """Same guarantee on the production fast path (bf16, packed-int8
    warp, s2d carry)."""
    from tecogan_tpu.engine import build_chunked_inference

    cfg = small_cfg(precision="bf16", bug_parity=False)
    state = init_state(cfg, jax.random.PRNGKey(0))
    clip = jnp.asarray(rng.random((1, 10, 8, 8, 3)).astype(np.float32))
    one_shot = np.asarray(cached_clip_inference(cfg)(state.params_g, clip))
    chunked = build_chunked_inference(cfg)(state.params_g, clip, chunk=4)
    np.testing.assert_allclose(chunked, one_shot, atol=2e-2)
    # windows must agree with the one-shot scan much more tightly than
    # bf16 signal level — chunking must not perturb the recurrence
    assert np.abs(chunked - one_shot).mean() < 2e-3


def test_chunked_sink_long_clip(rng, tmp_path):
    """A long clip streams through a sink in order with O(window) host
    memory; the MediaWriter round-trip re-decodes to the same frames."""
    import cv2

    from tecogan_tpu.engine import build_chunked_inference
    from tecogan_tpu.ops import MediaWriter

    cfg = small_cfg()
    state = init_state(cfg, jax.random.PRNGKey(0))
    T = 500
    t = np.linspace(0, 1, T, dtype=np.float32)
    clip = np.broadcast_to(
        t[None, :, None, None, None], (1, T, 8, 8, 3)
    ).astype(np.float32)

    seen = []
    out = str(tmp_path / "long.mp4")
    with MediaWriter(out) as w:
        build_chunked_inference(cfg)(
            state.params_g, clip, chunk=64,
            sink=lambda sr: (seen.append(sr.shape[1]), w.append(sr[0])),
        )
    assert sum(seen) == T
    assert max(seen) <= 64  # never holds more than one window
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == T
    cap.release()


def test_graft_entry_single_chip():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 256, 256, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_aot_export_roundtrip(tmp_path, rng):
    """jax.export'ed head/cont window programs must be bit-equal to the
    live chunked-inference programs after serialize->deserialize
    (tools/export_infer.py serving artifact)."""
    from jax import export as jax_export
    from tecogan_tpu.engine.inference import build_chunked_inference

    cfg = small_cfg(bug_parity=False)
    state = init_state(cfg, jax.random.PRNGKey(0))
    infer = build_chunked_inference(cfg)
    spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype), state.params_g
    )
    lr_spec = jax.ShapeDtypeStruct((1, 4, 8, 8, 3), jnp.float32)
    carry_spec, _ = jax.eval_shape(infer.head_fn, spec, lr_spec)
    head_rt = jax_export.deserialize(
        jax_export.export(infer.head_fn)(spec, lr_spec).serialize())
    cont_rt = jax_export.deserialize(
        jax_export.export(infer.cont_fn)(spec, carry_spec, lr_spec).serialize())

    lr1 = jnp.asarray(rng.random((1, 4, 8, 8, 3)).astype(np.float32))
    lr2 = jnp.asarray(rng.random((1, 4, 8, 8, 3)).astype(np.float32))
    c_l, sr1_l = infer.head_fn(state.params_g, lr1)
    c_r, sr1_r = head_rt.call(state.params_g, lr1)
    np.testing.assert_array_equal(np.asarray(sr1_l), np.asarray(sr1_r))
    _, sr2_l = infer.cont_fn(state.params_g, c_l, lr2)
    _, sr2_r = cont_rt.call(state.params_g, c_r, lr2)
    np.testing.assert_array_equal(np.asarray(sr2_l), np.asarray(sr2_r))


def test_u8_transfer_inference_bitparity(rng):
    """uint8 LR upload (transfer_quantize_u8 contract): the one-shot and
    chunked paths fed the SAME u8 clip must agree bit-for-bit with the
    f32 path fed the host-dequantized clip — device-side
    ``astype(f32) * f32(1/255)`` equals the host multiply exactly."""
    from tecogan_tpu.engine import build_chunked_inference
    from tecogan_tpu.ops.image import transfer_quantize_u8

    cfg = small_cfg()
    state = init_state(cfg, jax.random.PRNGKey(0))
    clip_f32 = rng.random((1, 9, 8, 8, 3)).astype(np.float32)
    q = transfer_quantize_u8(clip_f32)
    host_deq = q.astype(np.float32) * np.float32(1.0 / 255.0)

    infer = cached_clip_inference(cfg)
    ref = np.asarray(infer(state.params_g, jnp.asarray(host_deq)))
    via_u8 = np.asarray(infer(state.params_g, jnp.asarray(q)))
    np.testing.assert_array_equal(via_u8, ref)

    chunked = build_chunked_inference(cfg)(state.params_g, q, chunk=4)
    np.testing.assert_array_equal(chunked, ref)


def test_chunked_u8_output_matches_host_to_uint8(rng):
    """out_u8=True converts SR windows to uint8 ON DEVICE; must be
    bit-identical to fetching f32 windows and converting with to_uint8
    on host (the MediaWriter path) — fused fast path included."""
    from tecogan_tpu.engine import build_chunked_inference
    from tecogan_tpu.ops.image import to_uint8

    for kw in (dict(), dict(precision="bf16", bug_parity=False)):
        cfg = small_cfg(**kw)
        state = init_state(cfg, jax.random.PRNGKey(0))
        clip = jnp.asarray(rng.random((1, 9, 8, 8, 3)).astype(np.float32))
        f32_out = build_chunked_inference(cfg)(state.params_g, clip, chunk=4)
        u8_out = build_chunked_inference(cfg, out_u8=True)(
            state.params_g, clip, chunk=4)
        assert u8_out.dtype == np.uint8
        np.testing.assert_array_equal(u8_out, to_uint8(f32_out))


def test_stream_u8_frames_match_f32(rng):
    """Streaming step with uint8 frames == the same stream fed the
    host-dequantized f32 frames (all three stream variants share
    _dequant_in; exercise exact + fused s2d)."""
    from tecogan_tpu.ops.image import transfer_quantize_u8

    for kw in (dict(), dict(precision="bf16", bug_parity=False)):
        cfg = small_cfg(**kw)
        state = init_state(cfg, jax.random.PRNGKey(0))
        frames_f32 = rng.random((5, 1, 8, 8, 3)).astype(np.float32)
        q = transfer_quantize_u8(frames_f32)
        host_deq = q.astype(np.float32) * np.float32(1.0 / 255.0)

        init_fn, step_fn = build_stream_inference(cfg)
        s_u8 = init_fn((1, 8, 8, 3))
        s_f32 = init_fn((1, 8, 8, 3))
        for t in range(5):
            s_u8, sr_u8 = step_fn(state.params_g, s_u8, jnp.asarray(q[t]))
            s_f32, sr_f32 = step_fn(
                state.params_g, s_f32, jnp.asarray(host_deq[t]))
            np.testing.assert_array_equal(
                np.asarray(sr_u8), np.asarray(sr_f32))
