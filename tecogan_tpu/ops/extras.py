"""Working implementations of the reference's dead/broken op stubs
(SURVEY.md component 22 — "document intent, don't port bugs").

Every function here is unreferenced-or-broken in the reference
(code/ops.py:93-125,218-224); we implement the documented intent so the
surface is complete:
  * pixelshuffle        (ops.py:93-95 — typo'd nn.PixelShuffel)
  * phase_shift         (ops.py:108-111 — invalid torch.transpose args)
  * random_flip / random_flip_batch (ops.py:114-125 — nonexistent
    torch.identity; intent: elementwise-decided horizontal flip)
  * gaussian_2dkernel   (ops.py:218-224 — works in the reference, kept)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .space import depth_to_space


def pixelshuffle(x_nhwc: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """Sub-pixel upsample: (B, H, W, C*s^2) -> (B, sH, sW, C)."""
    return depth_to_space(x_nhwc, block=scale)


def phase_shift(x: jnp.ndarray, scale: int, shape_1, shape_2) -> jnp.ndarray:
    """The ESPCN phase-shift core the reference's stub sketches: reshape,
    interleave the sub-pixel phases, reshape."""
    y = jnp.reshape(x, shape_1)
    y = jnp.transpose(y, (0, 1, 3, 2, 4))
    return jnp.reshape(y, shape_2)


def random_flip_batch(x: jnp.ndarray, decision: jnp.ndarray) -> jnp.ndarray:
    """Per-sample horizontal flip where decision < 0.5 (NCHW batches,
    matching the reference's dim=3 flip intent)."""
    flipped = jnp.flip(x, axis=3)
    cond = (decision < 0.5).reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.where(cond, flipped, x)


def random_flip(x: jnp.ndarray, decision) -> jnp.ndarray:
    """Whole-tensor flip when decision < 0.5."""
    return jnp.where(decision < 0.5, jnp.flip(x, axis=3), x)


def gaussian_2dkernel(size: int = 5, sig: float = 1.0) -> np.ndarray:
    """Normalized 2D Gaussian kernel (reference ops.py:218-224)."""
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(ax**2) / (2.0 * sig**2))
    k = np.outer(g, g)
    return k / k.sum()
