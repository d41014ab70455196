"""FNet-gated training variant (FRVSR pretrain config) tests."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.engine.fnet_train import (
    build_fnet_train_step,
    flow_to_grid,
    fnet_generator_unroll,
)


def test_flow_to_grid_zero_flow_is_identity(rng):
    """Zero displacement must sample each pixel from itself."""
    from tecogan_tpu.ops.warp import grid_sample_nchw

    img = jnp.asarray(rng.random((1, 3, 8, 12)).astype(np.float32))
    grid = flow_to_grid(jnp.zeros((1, 2, 8, 12)))
    out = grid_sample_nchw(img, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_flow_to_grid_unit_shift(rng):
    """Flow (+1, 0) samples one pixel to the right."""
    from tecogan_tpu.ops.warp import grid_sample_nchw

    img = jnp.asarray(rng.random((1, 3, 6, 6)).astype(np.float32))
    flow = jnp.zeros((1, 2, 6, 6)).at[:, 0].set(1.0)
    out = grid_sample_nchw(img, flow_to_grid(flow))
    np.testing.assert_allclose(
        np.asarray(out[:, :, :, :-1]), np.asarray(img[:, :, :, 1:]), atol=1e-5
    )


@pytest.mark.slow
def test_fnet_train_step_runs(rng):
    cfg = TecoConfig(crop_size=16, RNN_N=3, num_resblock=1, precision="fp32")
    init, step = build_fnet_train_step(cfg)
    state = init(jax.random.PRNGKey(0))
    lr = jnp.asarray(rng.random((1, 3, 3, 16, 16)).astype(np.float32))
    hr = jnp.asarray(rng.random((1, 3, 3, 64, 64)).astype(np.float32))
    new_state, metrics = step(state, lr, hr)
    assert np.isfinite(float(metrics["gen_loss"]))
    assert np.isfinite(float(metrics["l2_warp_loss"]))
    moved = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                     state["params_f"], new_state["params_f"]),
    )
    assert moved > 0  # FNet actually trains
