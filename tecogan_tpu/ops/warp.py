"""Bilinear grid sampling with torch ``F.grid_sample`` default semantics.

The reference warps the previous SR output by a *pseudo-flow* — the
bilinearly 4x-upsampled previous LR frame times 4, channels 0:2, raw-reshaped
into an absolute sampling grid (/root/reference/code/train.py:71-77,98).
Torch defaults there: mode='bilinear', padding_mode='zeros',
align_corners=False.

Grid convention (torch): ``grid[..., 0] = x`` (width coord), ``grid[..., 1] =
y`` (height coord), both normalized to [-1, 1]; with align_corners=False the
unnormalized coordinate is ``((g + 1) * size - 1) / 2``.  Out-of-range
samples read zeros; each of the four bilinear taps is masked independently.

This file is the XLA reference implementation; the fast paths for the hot
recurrent-feedback loop live in ``tecogan_tpu/engine/fused.py``
(packed-int8 single-gather warp) and ``tecogan_tpu/ops/pallas/
warp_combine.py`` (Pallas tap-combine kernel).
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    # align_corners=False: maps [-1, 1] to [-0.5, size - 0.5] pixel centers.
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample(image: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear, zero-padded, align_corners=False grid sample.

    Args:
      image: ``(B, H, W, C)`` NHWC input.
      grid:  ``(B, Hg, Wg, 2)`` normalized sampling grid, last dim = (x, y).

    Returns:
      ``(B, Hg, Wg, C)`` sampled output, dtype of ``image``.
    """
    B, H, W, C = image.shape
    compute_dtype = jnp.promote_types(image.dtype, jnp.float32)
    g = grid.astype(compute_dtype)

    ix = _unnormalize(g[..., 0], W)
    iy = _unnormalize(g[..., 1], H)

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    ix1 = ix0 + 1.0
    iy1 = iy0 + 1.0

    # Bilinear weights.
    wx1 = ix - ix0
    wx0 = 1.0 - wx1
    wy1 = iy - iy0
    wy0 = 1.0 - wy1

    def gather(iy_, ix_):
        """Zero-padded gather of image[b, iy_, ix_, :]."""
        valid = (
            (ix_ >= 0) & (ix_ <= W - 1) & (iy_ >= 0) & (iy_ <= H - 1)
        )
        xc = jnp.clip(ix_, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(iy_, 0, H - 1).astype(jnp.int32)
        flat = image.reshape(B, H * W, C)
        idx = yc * W + xc  # (B, Hg, Wg)
        vals = jnp.take_along_axis(
            flat, idx.reshape(B, -1, 1), axis=1
        ).reshape(B, idx.shape[1], idx.shape[2], C)
        return vals * valid[..., None].astype(image.dtype)

    out = (
        gather(iy0, ix0) * (wy0 * wx0)[..., None].astype(image.dtype)
        + gather(iy0, ix1) * (wy0 * wx1)[..., None].astype(image.dtype)
        + gather(iy1, ix0) * (wy1 * wx0)[..., None].astype(image.dtype)
        + gather(iy1, ix1) * (wy1 * wx1)[..., None].astype(image.dtype)
    )
    return out


def grid_sample_nchw(image: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """NCHW wrapper matching ``F.grid_sample(image_nchw, grid)`` exactly."""
    out = grid_sample(jnp.transpose(image, (0, 2, 3, 1)), grid)
    return jnp.transpose(out, (0, 3, 1, 2))


def pseudo_flow_nchw(prev_lr_nchw: jnp.ndarray, parity_half: bool = False) -> jnp.ndarray:
    """The reference's degenerate "flow": bilinear-4x of ``prev_lr * 4``,
    channels 0:2, raw-viewed (not permuted!) into a ``(B, 4H, 4W, 2)`` grid
    (code/train.py:71-77 + the .view at train.py:96).

    Args:
      prev_lr_nchw: ``(B, 3, H, W)`` previous LR frame in [0, 1].
      parity_half: if True, round the grid through fp16 like the reference's
        ``cur_flow.half()`` cast under CUDA AMP (code/train.py:98).

    Returns:
      ``(B, 4H, 4W, 2)`` absolute sampling grid.
    """
    from .resize import upscale_four

    B, C, H, W = prev_lr_nchw.shape
    up = upscale_four(prev_lr_nchw * 4.0, layout="NCHW")  # (B, 3, 4H, 4W)
    flow = up[:, 0:2]  # (B, 2, 4H, 4W)
    # Reference does .view(B, 4H, 4W, 2) on the contiguous NCHW tensor —
    # a raw C-order reinterpretation, NOT a transpose.  jnp.reshape matches.
    grid = jnp.reshape(flow, (B, 4 * H, 4 * W, 2))
    if parity_half:
        grid = grid.astype(jnp.float16).astype(jnp.float32)
    return grid
