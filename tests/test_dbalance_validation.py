"""Tests for D-balance gating (fixed mode) and the validation split."""

import numpy as np
import jax
import jax.numpy as jnp

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.engine import init_state, build_train_step


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


def test_parity_mode_never_gates_d(rng):
    cfg = tiny_cfg(bug_parity=True)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = build_train_step(cfg, donate=False)
    lr, hr = make_batch(cfg, rng)
    _, metrics, _ = step(state, lr, hr)
    assert float(metrics["withD_counter"]) == 1.0
    assert float(metrics["w_o_D_counter"]) == 0.0


def test_fixed_mode_gates_d_when_winning(rng):
    """With a huge Dbalance threshold the gate must skip the D update
    (t_balance starts near log(0.5)+0.69 ≈ 0)."""
    cfg = tiny_cfg(bug_parity=False, Dbalance=-100.0)  # tb > 100 impossible
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = build_train_step(cfg, donate=False)
    lr, hr = make_batch(cfg, rng)
    new_state, metrics, _ = step(state, lr, hr)
    assert float(metrics["w_o_D_counter"]) == 1.0
    # D params unchanged when gated
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params_d, new_state.params_d,
    )
    assert max(jax.tree.leaves(diffs)) == 0.0


def test_fixed_mode_allows_d_normally(rng):
    cfg = tiny_cfg(bug_parity=False, Dbalance=0.4)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = build_train_step(cfg, donate=False)
    lr, hr = make_batch(cfg, rng)
    new_state, metrics, _ = step(state, lr, hr)
    assert float(metrics["withD_counter"]) == 1.0
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params_d, new_state.params_d,
    )
    assert max(jax.tree.leaves(diffs)) > 0.0
