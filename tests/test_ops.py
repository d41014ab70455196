"""Unit tests for the op library — parity against torch primitives.

These tests check our JAX ops against torch's *primitives* (F.grid_sample,
nn.Upsample, tensor.view/permute) on random inputs, since the reference
delegates all op semantics to torch (SURVEY.md §2 native-code note).
"""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F
import pytest

from tecogan_tpu.ops import (
    space_to_depth,
    depth_to_space,
    space_to_depth_nchw,
    upscale_four,
    upscale_two,
    bicubic_four,
    grid_sample,
    grid_sample_nchw,
    pseudo_flow_nchw,
    preprocess,
    deprocess,
    psnr_255,
)


def test_space_to_depth_matches_reference_permute(rng):
    """Channel order must be c*16 + a*4 + b (code/train.py:102-106)."""
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)  # NCHW 4x res
    t = torch.from_numpy(x)
    # the reference sequence: view(B,3,H,4,W,4).permute(0,1,3,5,2,4).reshape
    ref = (
        t.view(2, 3, 4, 4, 4, 4).permute(0, 1, 3, 5, 2, 4).reshape(2, 48, 4, 4)
    ).numpy()

    got_nchw = np.asarray(space_to_depth_nchw(jnp.asarray(x)))
    np.testing.assert_allclose(got_nchw, ref, rtol=0, atol=0)

    # NHWC variant must agree after layout conversion
    x_nhwc = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
    got_nhwc = np.asarray(space_to_depth(x_nhwc))
    np.testing.assert_allclose(
        np.transpose(got_nhwc, (0, 3, 1, 2)), ref, rtol=0, atol=0
    )


def test_depth_to_space_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 3)).astype(np.float32))
    packed = space_to_depth(x)
    assert packed.shape == (2, 2, 3, 48)
    back = depth_to_space(packed)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0)


@pytest.mark.parametrize("scale_fn,torch_mode,factor", [
    (upscale_four, "bilinear", 4),
    (upscale_two, "bilinear", 2),
])
def test_upscale_matches_torch(rng, scale_fn, torch_mode, factor):
    """nn.Upsample(align_corners=False) == jax.image.resize half-pixel
    (reference ops.py:98-105)."""
    x = rng.random((2, 3, 7, 9)).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(x), scale_factor=factor, mode=torch_mode
    ).numpy()
    got = np.asarray(scale_fn(jnp.asarray(x), layout="NCHW"))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_bicubic_four_close_to_torch(rng):
    """bicubic_four is unreferenced dead code in the reference
    (SURVEY.md component 22); jax's cubic kernel (a=-0.5) differs from
    torch's (a=-0.75), so only approximate agreement is expected."""
    x = rng.random((1, 3, 7, 9)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=4, mode="bicubic").numpy()
    got = np.asarray(bicubic_four(jnp.asarray(x), layout="NCHW"))
    assert got.shape == ref.shape
    assert np.abs(got - ref).mean() < 0.02


def test_grid_sample_matches_torch_inrange(rng):
    img = rng.random((2, 3, 12, 10)).astype(np.float32)
    grid = (rng.random((2, 6, 5, 2)).astype(np.float32) * 2 - 1)
    ref = F.grid_sample(
        torch.from_numpy(img), torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).numpy()
    got = np.asarray(grid_sample_nchw(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_grid_sample_matches_torch_outofrange(rng):
    """The pseudo-flow grid is mostly outside [-1,1]; zero-padding tap
    masking must match torch exactly."""
    img = rng.random((1, 3, 8, 8)).astype(np.float32)
    grid = (rng.random((1, 8, 8, 2)).astype(np.float32) * 8 - 2)  # [-2, 6]
    ref = F.grid_sample(
        torch.from_numpy(img), torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).numpy()
    got = np.asarray(grid_sample_nchw(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_pseudo_flow_matches_reference_sequence(rng):
    """upscale_four(lr*4)[:, :2].view(B, 4H, 4W, 2) (code/train.py:71-77,96)."""
    lr = rng.random((2, 3, 8, 8)).astype(np.float32)
    t = torch.from_numpy(lr)
    up = F.interpolate(t * 4.0, scale_factor=4, mode="bilinear")
    ref = up[:, 0:2].reshape(2, 32, 32, 2).numpy()
    got = np.asarray(pseudo_flow_nchw(jnp.asarray(lr)))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_preprocess_roundtrip():
    x = jnp.linspace(0, 1, 7)
    np.testing.assert_allclose(np.asarray(deprocess(preprocess(x))), np.asarray(x), atol=1e-7)
    np.testing.assert_allclose(np.asarray(preprocess(x)), np.asarray(x) * 2 - 1, atol=1e-7)


def test_psnr_identical_is_inf_and_scale():
    a = jnp.ones((1, 4, 4, 3)) * 100.0
    b = a + 10.0
    # mse=100 -> psnr = 10*log10(65025/100) ≈ 28.13
    np.testing.assert_allclose(float(psnr_255(a, b)), 28.131, atol=1e-2)
