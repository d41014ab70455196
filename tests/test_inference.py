"""Inference engine tests: scan vs streaming equivalence, shape
polymorphism, and equivalence with the training-engine unroll."""

import numpy as np
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


def small_cfg(**kw):
    base = dict(crop_size=8, num_resblock=2, precision="fp32", jit=True)
    base.update(kw)
    return TecoConfig(**base)


def test_clip_inference_shapes(rng):
    cfg = small_cfg()
    state = init_state(cfg, jax.random.PRNGKey(0))
    infer = build_clip_inference(cfg)
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
    infer = build_clip_inference(cfg)
    clip = jnp.asarray(rng.random((1, 3, 6, 10, 3)).astype(np.float32))
    sr = infer(state.params_g, clip)
    assert sr.shape == (1, 3, 24, 40, 3)


def test_stream_matches_scan(rng):
    cfg = small_cfg()
    state = init_state(cfg, jax.random.PRNGKey(0))
    infer = build_clip_inference(cfg)
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


def test_inference_matches_training_unroll(rng):
    """The inference scan must produce the same frames as the training
    engine's unroll (same recurrence: main.py:173-216 vs train.py:86-111)."""
    cfg = small_cfg(RNN_N=5, bug_parity=True)
    state = init_state(cfg, jax.random.PRNGKey(0))
    gen, _ = model_defs(cfg)

    clip_nhwc = jnp.asarray(rng.random((2, 5, 8, 8, 3)).astype(np.float32))
    clip_nchw = jnp.transpose(clip_nhwc, (0, 1, 4, 2, 3))

    infer = build_clip_inference(cfg)
    sr_inf = infer(state.params_g, clip_nhwc)  # (B,T,4H,4W,3)

    unroll = generator_unroll(gen, state.params_g, clip_nchw, cfg)
    sr_train = jnp.transpose(unroll.gen_outputs, (0, 1, 3, 4, 2))
    np.testing.assert_allclose(
        np.asarray(sr_inf), np.asarray(sr_train), atol=1e-5
    )


def test_graft_entry_single_chip():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 256, 256, 3)
    assert np.isfinite(np.asarray(out)).all()
