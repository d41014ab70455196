"""Bilinear/bicubic resizes matching the reference's torch semantics.

``upscale_four`` is the reference's 4x bilinear upsample
(``nn.Upsample(scale_factor=4, mode="bilinear")``, align_corners=False:
/root/reference/code/ops.py:98-100).  torch's ``align_corners=False``
uses half-pixel source centers, which is exactly ``jax.image.resize``'s
convention, so the two agree to float tolerance (verified in
tests/test_ops_resize.py against torch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_nhwc(x: jnp.ndarray, out_h: int, out_w: int, method: str = "bilinear") -> jnp.ndarray:
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, out_h, out_w, C), method=method)


def resize_nchw(x: jnp.ndarray, out_h: int, out_w: int, method: str = "bilinear") -> jnp.ndarray:
    B, C, H, W = x.shape
    return jax.image.resize(x, (B, C, out_h, out_w), method=method)


def upscale_four(x: jnp.ndarray, layout: str = "NHWC") -> jnp.ndarray:
    """4x bilinear upsample (reference ops.py:98-100)."""
    if layout == "NHWC":
        return resize_nhwc(x, x.shape[1] * 4, x.shape[2] * 4, "bilinear")
    return resize_nchw(x, x.shape[2] * 4, x.shape[3] * 4, "bilinear")


def bicubic_four(x: jnp.ndarray, layout: str = "NHWC") -> jnp.ndarray:
    """4x bicubic upsample (reference ops.py:103-105)."""
    if layout == "NHWC":
        return resize_nhwc(x, x.shape[1] * 4, x.shape[2] * 4, "bicubic")
    return resize_nchw(x, x.shape[2] * 4, x.shape[3] * 4, "bicubic")


def upscale_two(x: jnp.ndarray, layout: str = "NHWC") -> jnp.ndarray:
    """2x bilinear upsample (FNet up blocks, reference code/models.py:17)."""
    if layout == "NHWC":
        return resize_nhwc(x, x.shape[1] * 2, x.shape[2] * 2, "bilinear")
    return resize_nchw(x, x.shape[2] * 2, x.shape[3] * 2, "bilinear")
