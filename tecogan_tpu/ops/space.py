"""Space-to-depth / depth-to-space with the reference's exact channel order.

The recurrent feedback path packs the warped previous 4x SR output
``(B, 3, 4H, 4W)`` into 48 LR channels.  The reference does
``view(B,3,H,4,W,4).permute(0,1,3,5,2,4).reshape(B,48,H,W)``
(/root/reference/code/train.py:102-106), i.e. output channel index is
``c*16 + a*4 + b`` where ``(a, b)`` is the (row, col) sub-pixel offset.

We keep NHWC layout on TPU but preserve that channel numbering so that
converted reference checkpoints see identical inputs.
"""

from __future__ import annotations

import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray, block: int = 4) -> jnp.ndarray:
    """NHWC ``(B, bH, bW, C) -> (B, H, W, C*b*b)``.

    Output channel index is ``c*b*b + a*b + bb`` (channel-major, then row
    offset, then col offset) matching the reference permute order
    (code/train.py:102-106).
    """
    B, Hb, Wb, C = x.shape
    H, W = Hb // block, Wb // block
    x = x.reshape(B, H, block, W, block, C)
    # (B, H, W, C, a, b) -> channels c*b*b + a*b + bb
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(B, H, W, C * block * block)


def depth_to_space(x: jnp.ndarray, block: int = 4) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth` (same channel numbering)."""
    B, H, W, Cbb = x.shape
    C = Cbb // (block * block)
    x = x.reshape(B, H, W, C, block, block)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, H, a, W, b, C)
    return x.reshape(B, H * block, W * block, C)


def space_to_depth_nchw(x: jnp.ndarray, block: int = 4) -> jnp.ndarray:
    """NCHW variant, bit-exact to code/train.py:102-106 for parity tests."""
    B, C, Hb, Wb = x.shape
    H, W = Hb // block, Wb // block
    x = x.reshape(B, C, H, block, W, block)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, C, a, b, H, W)
    return x.reshape(B, C * block * block, H, W)
