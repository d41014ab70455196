"""Pallas warp-combine kernel correctness (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from tecogan_tpu.engine.fused import (
    build_packed_table_int8,
    grid_sample_packed_int8,
)
from tecogan_tpu.ops.pallas.warp_combine import warp_combine


def test_warp_combine_matches_xla_combine(rng):
    """Gather rows with XLA, combine with the Pallas kernel (interpret),
    compare against the full XLA packed-int8 sampler."""
    H, W, C = 16, 16, 3
    img = jnp.asarray(rng.random((1, H, W, C)).astype(np.float32))
    grid = jnp.asarray((rng.random((1, 12, 8, 2)) * 4 - 2).astype(np.float32))

    ref = np.asarray(grid_sample_packed_int8(img, grid))  # (1,12,8,3)

    # reproduce the gather half exactly like the XLA sampler
    g = np.asarray(grid, np.float32)
    ix = ((g[..., 0] + 1.0) * W - 1.0) / 2.0
    iy = ((g[..., 1] + 1.0) * H - 1.0) / 2.0
    xb = np.clip(np.floor(ix), 0, W - 1).astype(np.int32)
    yb = np.clip(np.floor(iy), 0, H - 1).astype(np.int32)
    q = xb // 4
    cols = W // 4
    idx = (yb * cols + q).reshape(1, -1)
    table = np.asarray(build_packed_table_int8(img, 4))
    rows = np.take_along_axis(table, idx[..., None], axis=1)[0]  # (M, lanes)
    rows = rows[:, :32].astype(np.uint8)

    out = warp_combine(
        jnp.asarray(rows), jnp.asarray(ix.ravel()), jnp.asarray(iy.ravel()),
        height=H, width=W, interpret=True,
    )
    got = np.asarray(out).reshape(1, 12, 8, 3)
    # the XLA hot-path sampler combines in bf16 (weights rounded to 2^-9);
    # the Pallas kernel keeps f32 — agreement is at bf16 rounding level
    np.testing.assert_allclose(got, ref, atol=2e-2)


def test_pallas_sampler_equals_xla_sampler(rng):
    from tecogan_tpu.engine.attic import grid_sample_packed_int8_pallas

    img = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    grid = jnp.asarray((rng.random((2, 12, 8, 2)) * 4 - 2).astype(np.float32))
    ref = np.asarray(grid_sample_packed_int8(img, grid))
    got = np.asarray(grid_sample_packed_int8_pallas(img, grid))
    # bf16 (XLA path) vs f32 (Pallas kernel) combine arithmetic
    np.testing.assert_allclose(got, ref, atol=2e-2)
    # and the Pallas path must still match the EXACT f32 sampler closely
    from tecogan_tpu.ops.warp import grid_sample
    exact = np.asarray(grid_sample(img, grid))
    assert np.abs(got - exact).max() < 0.01
