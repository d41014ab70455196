"""Pallas TPU kernel: bilinear tap-combine for the packed-int8 warp.

The packed warp (engine/fused.py::grid_sample_packed_int8) splits into
(a) ONE row gather — unexpressible in Mosaic (no in-kernel gather in this
jax build) and fast in XLA, and (b) the tap combine: per output pixel,
select 4 taps out of the 30-lane packed row, weight them bilinearly, mask
out-of-bounds taps.  XLA lowers (b) as ~20 masked elementwise passes over
the full tensor; this kernel does it in ONE VMEM pass — per tile it
materializes the lane-selection weights from iota comparisons and reduces
over the packed lanes.

Layout: rows (M, 32) uint8 (gather output), ix/iy (M, 1) f32 unnormalized
sample coordinates, out (M, 4) f32 (channel-padded).  Grid over M tiles.

Reference semantics covered: torch grid_sample bilinear/zeros/
align_corners=False (code/train.py:98) on the uint8-quantized carried
frame; kernel result matches grid_sample_packed_int8 exactly
(tests/test_pallas_combine.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 4  # base columns per packed row (matches build_packed_table_int8)
GP1 = GROUP + 1
C = 3
LANES = 2 * GP1 * C  # 30 used lanes of the 32-lane row


def _combine_kernel(hw_ref, ix_ref, iy_ref, rows_ref, out_ref):
    H = hw_ref[0]
    W = hw_ref[1]
    ix = ix_ref[:, 0]
    iy = iy_ref[:, 0]
    Tm = ix.shape[0]

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    wx = ix - ix0
    wy = iy - iy0

    xb = jnp.clip(ix0, 0, W - 1).astype(jnp.int32)
    yb = jnp.clip(iy0, 0, H - 1).astype(jnp.int32)
    dx = xb - ix0.astype(jnp.int32)
    dy = yb - iy0.astype(jnp.int32)
    q = xb // GROUP
    s_in = xb - q * GROUP

    lane = jax.lax.broadcasted_iota(jnp.int32, (Tm, 32), 1)
    # rows arrive as bf16 (Mosaic can't cast uint8 directly; the caller
    # widens the gather output once in XLA)
    rows = rows_ref[:].astype(jnp.float32)

    taps = (
        (0, 0, (1.0 - wy) * (1.0 - wx)),
        (0, 1, (1.0 - wy) * wx),
        (1, 0, wy * (1.0 - wx)),
        (1, 1, wy * wx),
    )

    acc = jnp.zeros((Tm, 4), jnp.float32)
    for c in range(C):
        wmask = jnp.zeros((Tm, 32), jnp.float32)
        for r, s, w in taps:
            xx = ix0 + s
            yy = iy0 + r
            valid = (xx >= 0) & (xx <= W - 1) & (yy >= 0) & (yy <= H - 1)
            col5 = s_in - dx + s
            r_sel = r - dy
            in_pack = (col5 >= 0) & (col5 <= GROUP) & (r_sel >= 0) & (r_sel <= 1)
            tgt_lane = r_sel * (GP1 * C) + col5 * C + c
            wv = jnp.where(valid & in_pack, w, 0.0)
            wmask = wmask + jnp.where(
                lane == tgt_lane[:, None], wv[:, None], 0.0
            )
        chan = jnp.sum(rows * wmask, axis=1) * (1.0 / 255.0)
        acc = acc + chan[:, None] * (
            jax.lax.broadcasted_iota(jnp.int32, (Tm, 4), 1) == c
        ).astype(jnp.float32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("height", "width", "interpret"))
def warp_combine(rows_u8, ix, iy, *, height: int, width: int,
                 interpret: bool = False):
    """rows_u8 (M, 32) uint8, ix/iy (M,) f32 unnormalized coords ->
    (M, 3) f32 combined bilinear samples (x255-quantized source)."""
    M = rows_u8.shape[0]
    rows = rows_u8.astype(jnp.bfloat16)  # Mosaic has no uint8->float cast
    TILE = 1024
    pad = (-M) % TILE
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        ix = jnp.pad(ix, (0, pad))
        iy = jnp.pad(iy, (0, pad))
    Mp = rows.shape[0]
    hw = jnp.asarray([height, width], jnp.int32)

    out = pl.pallas_call(
        _combine_kernel,
        grid=(Mp // TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, 4), jnp.float32),
        interpret=interpret,
    )(hw, ix[:, None], iy[:, None], rows)
    return out[:M, :3]
