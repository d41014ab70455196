"""Tests for D-balance gating (fixed mode) and the validation split."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.engine import init_state, build_train_step

from conftest import cached_train_step


def tiny_cfg(**kw):
    base = dict(
        crop_size=8, RNN_N=9, num_resblock=1, discrim_resblocks=1,
        discrim_channels=16, batch_size=2, precision="fp32",
    )
    base.update(kw)
    return TecoConfig(**base)


def make_batch(cfg, rng, B=2):
    lr = rng.random((B, cfg.RNN_N, 3, cfg.crop_size, cfg.crop_size)).astype(np.float32)
    hr = rng.random((B, cfg.RNN_N, 3, cfg.crop_size * 4, cfg.crop_size * 4)).astype(np.float32)
    return jnp.asarray(lr), jnp.asarray(hr)


@pytest.mark.slow
def test_parity_mode_never_gates_d(rng):
    cfg = tiny_cfg(bug_parity=True)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = cached_train_step(cfg)
    lr, hr = make_batch(cfg, rng)
    _, metrics, _ = step(state, lr, hr)
    assert float(metrics["withD_counter"]) == 1.0
    assert float(metrics["w_o_D_counter"]) == 0.0


@pytest.mark.slow
def test_fixed_mode_gates_d_when_winning(rng):
    """Gate direction: apply_d = (tb < Dbalance).  tb < -100 is impossible
    (t_balance starts near 0), so the D update must be skipped."""
    cfg = tiny_cfg(bug_parity=False, Dbalance=-100.0)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = cached_train_step(cfg)
    lr, hr = make_batch(cfg, rng)
    new_state, metrics, _ = step(state, lr, hr)
    assert float(metrics["w_o_D_counter"]) == 1.0
    # D params unchanged when gated
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params_d, new_state.params_d,
    )
    assert max(jax.tree.leaves(diffs)) == 0.0


@pytest.mark.slow
def test_gate_direction_tracks_t_balance(rng):
    """Drive the gate across the measured t_balance of a fixed (state,
    batch): a threshold just BELOW the winning measure must skip the D
    update, a threshold just ABOVE it must apply it.  t_balance =
    mean(log(D_real)) + mean(-log(D_fake)) grows as D wins, so skipping
    when tb exceeds Dbalance is the correct direction."""
    state = init_state(tiny_cfg(bug_parity=False), jax.random.PRNGKey(0))
    lr, hr = make_batch(tiny_cfg(), rng)

    probe = build_train_step(tiny_cfg(bug_parity=False, Dbalance=1e9), donate=False)
    _, metrics, _ = probe(state, lr, hr)
    tb = float(metrics["t_balance"])

    def d_moved(dbalance):
        cfg = tiny_cfg(bug_parity=False, Dbalance=dbalance)
        step = cached_train_step(cfg)
        new_state, m, _ = step(state, lr, hr)
        diffs = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.params_d, new_state.params_d,
        )
        return max(jax.tree.leaves(diffs)) > 0.0, float(m["withD_counter"])

    moved_hi, counter_hi = d_moved(tb + 1.0)  # tb below threshold -> train D
    moved_lo, counter_lo = d_moved(tb - 1.0)  # tb above threshold -> skip D
    assert moved_hi and counter_hi == 1.0
    assert not moved_lo and counter_lo == 0.0


@pytest.mark.slow
def test_fixed_mode_allows_d_normally(rng):
    cfg = tiny_cfg(bug_parity=False, Dbalance=0.4)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = cached_train_step(cfg)
    lr, hr = make_batch(cfg, rng)
    new_state, metrics, _ = step(state, lr, hr)
    assert float(metrics["withD_counter"]) == 1.0
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params_d, new_state.params_d,
    )
    assert max(jax.tree.leaves(diffs)) > 0.0
