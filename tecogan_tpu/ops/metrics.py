"""Quality metrics.

The reference ships an (unused) ``compute_psnr`` (code/ops.py:130-139) and
reports no quantitative metrics at all.  BASELINE.md requires a real eval
harness (PSNR within 0.1 dB, LPIPS parity), so this module is new capability:
PSNR in the reference's 255-scale convention, plus SSIM and a VGG-feature
perceptual distance (LPIPS-style, usable with converted torchvision weights).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr_255(ref: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """PSNR with the reference's convention: inputs in [0,255]
    (code/ops.py:130-139 — MSE over all elements, peak 255)."""
    ref = ref.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mse = jnp.mean(jnp.square(target - ref))
    return 10.0 * jnp.log10(255.0 * 255.0 / mse)


def psnr(ref01: jnp.ndarray, target01: jnp.ndarray) -> jnp.ndarray:
    """PSNR for [0,1]-range images."""
    return psnr_255(ref01 * 255.0, target01 * 255.0)


def psnr_per_frame(ref01: jnp.ndarray, target01: jnp.ndarray) -> jnp.ndarray:
    """Per-frame PSNR over a (T, H, W, C) clip -> (T,) dB values.

    VSR papers report mean-of-per-frame PSNR, not PSNR of the pooled MSE
    (the two differ because log10 is concave); the eval harness reports
    both, with per-frame-mean as the headline."""
    d = jnp.square((target01 - ref01) * 255.0)
    mse = jnp.mean(d.reshape(d.shape[0], -1), axis=1)
    return 10.0 * jnp.log10(255.0 * 255.0 / mse)


def ssim(x: jnp.ndarray, y: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Mean SSIM over NHWC batches (11x11 Gaussian window, K1/K2 standard)."""
    sigma, win = 1.5, 11
    r = win // 2
    coords = jnp.arange(win, dtype=jnp.float32) - r
    g = jnp.exp(-(coords**2) / (2 * sigma**2))
    g = g / g.sum()
    kernel = jnp.outer(g, g)[:, :, None, None]  # HWIO, per-channel

    def filt(img):
        B, H, W, C = img.shape
        k = jnp.tile(kernel, (1, 1, 1, C))  # depthwise
        # HIGHEST: TPU convs default to bf16 accumulation, which destroys
        # the (mxx - mx^2) variance cancellation below (SSIM values way
        # outside [-1, 1] measured on v5e); full-f32 convs are required.
        return jax.lax.conv_general_dilated(
            img.astype(jnp.float32), k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
            precision=jax.lax.Precision.HIGHEST,
        )

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mx, my = filt(x), filt(y)
    mxx, myy, mxy = filt(x * x), filt(y * y), filt(x * y)
    vx = mxx - mx * mx
    vy = myy - my * my
    cxy = mxy - mx * my
    s = ((2 * mx * my + c1) * (2 * cxy + c2)) / (
        (mx * mx + my * my + c1) * (vx + vy + c2)
    )
    return jnp.mean(s)


def vgg_perceptual_distance(feats_x: dict, feats_y: dict, layers=None) -> jnp.ndarray:
    """Plain perceptual distance: mean squared difference of unit-normalized
    VGG features, averaged over the requested layers."""
    layers = layers or sorted(feats_x.keys())
    total = 0.0
    for name in layers:
        fx, fy = feats_x[name], feats_y[name]
        fx = fx / (jnp.linalg.norm(fx, axis=-1, keepdims=True) + 1e-10)
        fy = fy / (jnp.linalg.norm(fy, axis=-1, keepdims=True) + 1e-10)
        total = total + jnp.mean(jnp.square(fx - fy))
    return total / len(layers)


def lpips_distance(feats_x: dict, feats_y: dict, layers=None,
                   lin_weights: dict | None = None) -> jnp.ndarray:
    """LPIPS (Zhang et al. 2018) distance — the real architecture:
      d(x, y) = sum_l mean_hw( sum_c w_lc * (f̂x_l - f̂y_l)_c^2 )
    with channel-unit-normalized features f̂ and LEARNED per-channel linear
    weights w_l (the '1x1 conv' calibration head).

    ``lin_weights`` maps layer name -> (C_l,) nonnegative weights.  With
    real converted LPIPS weights this is the published metric; when None,
    uniform weights 1/C_l are used — that configuration must be reported
    as ``lpips_surrogate`` (this offline image has no pretrained LPIPS
    checkpoint; see cli/evaluate.py)."""
    layers = layers or sorted(feats_x.keys())
    total = 0.0
    for name in layers:
        fx, fy = feats_x[name], feats_y[name]
        fx = fx / (jnp.linalg.norm(fx, axis=-1, keepdims=True) + 1e-10)
        fy = fy / (jnp.linalg.norm(fy, axis=-1, keepdims=True) + 1e-10)
        sq = jnp.square(fx - fy)
        if lin_weights is not None and name in lin_weights:
            w = jnp.asarray(lin_weights[name]).reshape(1, 1, 1, -1)
        else:
            w = 1.0 / sq.shape[-1]
        total = total + jnp.mean(jnp.sum(sq * w, axis=-1))
    return total
