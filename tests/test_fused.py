"""Fused fast-path equivalence: the patch-gather warp and the re-tiled
first conv must match the reference-shaped path to float tolerance."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.engine import init_state
from tecogan_tpu.engine.state import model_defs
from tecogan_tpu.engine.inference import sr_step
from tecogan_tpu.engine.fused import (
    grid_sample_patch,
    fused_first_layer,
    fused_sr_step,
    retile_conv_in_kernel,
)
from tecogan_tpu.ops.space import space_to_depth
from tecogan_tpu.ops.image import deprocess


def test_grid_sample_patch_matches_torch_inrange(rng):
    img = rng.random((2, 3, 12, 10)).astype(np.float32)
    grid = (rng.random((2, 6, 5, 2)).astype(np.float32) * 2 - 1)
    ref = F.grid_sample(
        torch.from_numpy(img), torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).numpy()
    img_nhwc = jnp.transpose(jnp.asarray(img), (0, 2, 3, 1))
    got = np.asarray(
        grid_sample_patch(img_nhwc, jnp.asarray(grid), dtype=jnp.float32)
    )
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), ref, atol=1e-5)


def test_grid_sample_patch_matches_torch_outofrange(rng):
    """Edge cases: bases at -1, far OOB, exactly W-1."""
    img = rng.random((1, 3, 8, 8)).astype(np.float32)
    grid = (rng.random((1, 8, 8, 2)).astype(np.float32) * 8 - 3)  # [-3, 5]
    ref = F.grid_sample(
        torch.from_numpy(img), torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).numpy()
    img_nhwc = jnp.transpose(jnp.asarray(img), (0, 2, 3, 1))
    got = np.asarray(
        grid_sample_patch(img_nhwc, jnp.asarray(grid), dtype=jnp.float32)
    )
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), ref, atol=1e-5)


def test_fused_first_layer_matches_unfused(rng):
    cfg = TecoConfig(crop_size=8, num_resblock=2, precision="fp32")
    state = init_state(cfg, jax.random.PRNGKey(0))
    gen, _ = model_defs(cfg)

    cur_lr = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    warped = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32) * 2 - 1)

    # reference-shaped: s2d(deprocess(warped)) ‖ lr -> conv_in -> relu
    fb = space_to_depth(deprocess(warped))
    inp = jnp.concatenate([cur_lr, fb], axis=-1)
    k = state.params_g["conv_in"]["kernel"]
    b = state.params_g["conv_in"]["bias"]
    ref = jax.nn.relu(
        jax.lax.conv_general_dilated(
            inp, k, (1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
    )

    got = fused_first_layer(state.params_g, cur_lr, warped, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_sr_step_matches_reference_path(rng):
    cfg = TecoConfig(crop_size=8, num_resblock=2, precision="fp32",
                     bug_parity=False)
    state = init_state(cfg, jax.random.PRNGKey(0))
    gen, _ = model_defs(cfg)
    variables = {"params": state.params_g}

    prev_sr = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    prev_lr = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    cur_lr = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))

    ref = sr_step(gen, state.params_g, prev_sr, prev_lr, cur_lr,
                  parity_half=False)
    got = fused_sr_step(gen, variables, state.params_g, prev_sr, prev_lr,
                        cur_lr, parity_half=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)


def test_phase_conv_transpose_matches_module(rng):
    """Phase-decomposed convT == the lhs-dilated ConvTranspose2x module
    (itself torch-parity tested)."""
    from tecogan_tpu.engine.attic import phase_conv_transpose_2x
    from tecogan_tpu.models.layers import ConvTranspose2x

    x = jnp.asarray(rng.standard_normal((2, 5, 7, 4)).astype(np.float32))
    mod = ConvTranspose2x(features=6)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    ref = mod.apply({"params": params}, x)
    got = phase_conv_transpose_2x(x, params["kernel"], params["bias"],
                                  dtype=jnp.float32)
    assert got.shape == (2, 10, 14, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_retile_kernel_shapes(rng):
    k = jnp.asarray(rng.standard_normal((3, 3, 51, 64)).astype(np.float32))
    k_lr, k12 = retile_conv_in_kernel(k)
    assert k_lr.shape == (3, 3, 3, 64)
    assert k12.shape == (12, 12, 3, 64)
    # spot-check the index mapping: K12[4*di+a, 4*dj+b, c] == K[di,dj,3+c*16+a*4+b]
    for (di, dj, c, a, bb) in [(0, 0, 0, 0, 0), (1, 2, 2, 3, 1), (2, 1, 1, 2, 3)]:
        np.testing.assert_allclose(
            np.asarray(k12[4 * di + a, 4 * dj + bb, c]),
            np.asarray(k[di, dj, 3 + c * 16 + a * 4 + bb]),
        )


def test_grid_sample_packed_int8_close_to_exact(rng):
    """Packed-int8 warp == exact warp within uint8 quantization (inputs in
    [0,1] like sigmoid outputs; zero-padding taps must be exactly zero)."""
    from tecogan_tpu.engine.fused import grid_sample_packed_int8
    from tecogan_tpu.ops.warp import grid_sample

    img = jnp.asarray(rng.random((2, 12, 16, 3)).astype(np.float32))
    grid = jnp.asarray((rng.random((2, 10, 8, 2)) * 4 - 2).astype(np.float32))
    exact = np.asarray(grid_sample(img, grid))
    got = np.asarray(grid_sample_packed_int8(img, grid))
    assert np.abs(got - exact).max() < 0.01  # bilinear of 1/510-quantized taps
    # exact zeros where the exact path is zero (all taps OOB)
    zero_mask = exact == 0.0
    # allow boundary rows where exact is 0 by coincidence of values
    assert np.abs(got[zero_mask]).max() < 0.01


def test_fused_sr_step_int8_close_to_exact_path(rng):
    cfg = TecoConfig(crop_size=8, num_resblock=2, precision="fp32",
                     bug_parity=False)
    state = init_state(cfg, jax.random.PRNGKey(0))
    gen, _ = model_defs(cfg)
    variables = {"params": state.params_g}

    prev_sr = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    prev_lr = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    cur_lr = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))

    ref = sr_step(gen, state.params_g, prev_sr, prev_lr, cur_lr,
                  parity_half=False)
    got = fused_sr_step(gen, variables, state.params_g, prev_sr, prev_lr,
                        cur_lr, parity_half=False, int8_feedback=True)
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 0.02
    # PSNR of the int8-feedback output vs exact must sit far above VSR levels
    mse = float(np.mean((np.asarray(got) - np.asarray(ref)) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 45


def test_fused_clip_inference_close_to_exact_over_time(rng):
    """Quantization must not accumulate through the recurrence: the fused
    clip inference (int8 feedback + bf16 carry) tracks the exact path
    within tolerance on the LAST frame of a 6-frame clip."""
    from tecogan_tpu.engine import build_clip_inference

    cfg_exact = TecoConfig(crop_size=8, num_resblock=2, precision="fp32",
                           bug_parity=False, use_pallas=False)
    cfg_fast = cfg_exact.replace(use_pallas=True)
    state = init_state(cfg_exact, jax.random.PRNGKey(0))
    clip = jnp.asarray(rng.random((1, 6, 8, 8, 3)).astype(np.float32))
    exact = np.asarray(build_clip_inference(cfg_exact)(state.params_g, clip))
    fast = np.asarray(build_clip_inference(cfg_fast)(state.params_g, clip))
    last_mse = float(np.mean((exact[:, -1] - fast[:, -1]) ** 2))
    psnr = 10 * np.log10(1.0 / max(last_mse, 1e-12))
    assert psnr > 40, psnr


def test_warp_feedback_s2d_matches_composition(rng):
    """warp_feedback_s2d_int8 == s2d(deprocess(packed-int8 warp))."""
    from tecogan_tpu.engine.attic import warp_feedback_s2d_int8
    from tecogan_tpu.engine.fused import grid_sample_packed_int8

    img = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    grid = jnp.asarray((rng.random((1, 16, 16, 2)) * 3 - 1.5).astype(np.float32))
    ref = space_to_depth(deprocess(grid_sample_packed_int8(img, grid)))
    got = warp_feedback_s2d_int8(img, grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_fused_first_frame_matches_zero_feedback(rng):
    from tecogan_tpu.engine.fused import fused_first_frame
    from tecogan_tpu.engine.inference import first_frame

    cfg = TecoConfig(crop_size=8, num_resblock=2, precision="fp32")
    state = init_state(cfg, jax.random.PRNGKey(0))
    gen, _ = model_defs(cfg)
    lr0 = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    ref = first_frame(gen, state.params_g, lr0)
    got = fused_first_frame(gen, {"params": state.params_g}, state.params_g, lr0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_packed_int8_rejects_indivisible_width(rng):
    """W % group != 0 silently sampled wrong rows before; must fail loudly."""
    import pytest
    from tecogan_tpu.engine.fused import build_packed_table_int8, grid_sample_packed_int8

    img = jnp.asarray(rng.random((1, 8, 10, 3)).astype(np.float32))
    grid = jnp.zeros((1, 8, 10, 2), jnp.float32)
    with pytest.raises(ValueError, match="W % group"):
        build_packed_table_int8(img, group=4)
    with pytest.raises(ValueError, match="W % group"):
        grid_sample_packed_int8(img, grid, group=4)


def test_planar_coords_match_grid(rng):
    """planar_pseudo_flow_coords must reproduce the raw-view grid's
    unnormalized coordinates exactly (same bilinear weights, same
    plane/column interleave semantics)."""
    from tecogan_tpu.engine.fused import (
        pseudo_flow_grid_fast, planar_pseudo_flow_coords,
    )

    for H, W in [(8, 12), (6, 8)]:
        prev_lr = jnp.asarray(rng.random((2, H, W, 3)).astype(np.float32))
        grid = pseudo_flow_grid_fast(prev_lr)
        H4, W4 = 4 * H, 4 * W
        ix_ref = ((grid[..., 0] + 1.0) * W4 - 1.0) / 2.0
        iy_ref = ((grid[..., 1] + 1.0) * H4 - 1.0) / 2.0
        ix, iy = planar_pseudo_flow_coords(prev_lr)
        np.testing.assert_allclose(np.asarray(ix), np.asarray(ix_ref), atol=2e-4)
        np.testing.assert_allclose(np.asarray(iy), np.asarray(iy_ref), atol=2e-4)


def test_packed_int8_coords_entry_matches_grid_entry(rng):
    from tecogan_tpu.engine.fused import (
        grid_sample_packed_int8, grid_sample_packed_int8_coords,
    )

    img = jnp.asarray(rng.random((1, 8, 12, 3)).astype(np.float32))
    grid = jnp.asarray((rng.random((1, 8, 12, 2)) * 2.4 - 1.2).astype(np.float32))
    a = grid_sample_packed_int8(img, grid, 4)
    ix = ((grid[..., 0] + 1.0) * 12 - 1.0) / 2.0
    iy = ((grid[..., 1] + 1.0) * 8 - 1.0) / 2.0
    b = grid_sample_packed_int8_coords(img, ix, iy, 4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_conv_out_s2d_matches_direct(rng):
    """Both s2d conv_out formulations (production identity-conv and the
    attic stride-4 retile) must be exactly the s2d of the direct 3x3
    conv + sigmoid."""
    from tecogan_tpu.engine.attic import (
        conv_out_s2d_stride4, retile_conv_out_s2d,
    )
    from tecogan_tpu.engine.fused import conv_out_s2d, s2d_to_frame

    feat = jnp.asarray(rng.random((1, 16, 24, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.1, (3, 3, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (3,)).astype(np.float32))
    direct = jax.nn.sigmoid(jax.lax.conv_general_dilated(
        feat, k, (1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b)
    s2d = conv_out_s2d(feat, k, b, out_dtype=jnp.float32)
    got = s2d_to_frame(s2d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(direct), atol=1e-6)

    K6, b48 = retile_conv_out_s2d(k, b)
    s2d4 = conv_out_s2d_stride4(feat, K6, b48, out_dtype=jnp.float32)
    got4 = s2d_to_frame(s2d4)
    np.testing.assert_allclose(np.asarray(got4), np.asarray(direct), atol=1e-6)


def test_conv_out_s2d_phase_matches_direct(rng):
    """The phase-decomposed conv_out (attic: measured slower end-to-end,
    DESIGN.md round-4 negative results) performs the identical
    multiply-adds: s2d-first + dense LR-resolution 1024->48 conv must
    equal the direct formulation to accumulation-order tolerance."""
    from tecogan_tpu.engine.attic import conv_out_s2d_phase
    from tecogan_tpu.engine.fused import conv_out_s2d

    feat = jnp.asarray(rng.random((2, 16, 24, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.1, (3, 3, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (3,)).astype(np.float32))
    a = conv_out_s2d(feat, k, b, out_dtype=jnp.float32)
    c = conv_out_s2d_phase(feat, k, b, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=2e-6)


def test_conv_out_s2d_pallas_matches_direct(rng):
    """The fused VMEM kernel (ops/pallas/conv_out_s2d.py) performs the
    identical multiply-adds as the direct chain — (r, V) offset
    decomposition, halo-row masking == SAME zero padding — verified in
    interpret mode at several shapes including non-square and B>1."""
    from tecogan_tpu.engine.fused import conv_out_s2d
    from tecogan_tpu.ops.pallas.conv_out_s2d import (
        conv_out_s2d_pallas, conv_out_s2d_pallas_paired)

    k = jnp.asarray(rng.normal(0, 0.1, (3, 3, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (3,)).astype(np.float32))
    for shape in [(1, 48, 64, 64), (2, 36, 32, 64), (1, 96, 128, 64)]:
        feat = jnp.asarray(rng.random(shape).astype(np.float32))
        a = conv_out_s2d(feat, k, b, out_dtype=jnp.float32)
        c = conv_out_s2d_pallas(feat, k, b, out_dtype=jnp.float32,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=2e-6)
        if (shape[1] // 4) % 2 == 0:  # paired variant needs even LR height
            d = conv_out_s2d_pallas_paired(feat, k, b, out_dtype=jnp.float32,
                                           interpret=True)
            np.testing.assert_allclose(np.asarray(d), np.asarray(a),
                                       atol=2e-6)


def test_s2d_table_matches_nhwc_table(rng):
    from tecogan_tpu.engine.fused import build_packed_table_int8, build_packed_table_s2d
    from tecogan_tpu.ops.space import space_to_depth

    img = jnp.asarray(rng.random((2, 8, 16, 3)).astype(np.float32))
    ref = build_packed_table_int8(img, 4)
    s2d = space_to_depth(img)  # (2, 2, 4, 48); channel conv is c*16+a*4+b?
    got = build_packed_table_s2d(s2d, 4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_s2d_carry_clip_inference_matches_nhwc_fast(rng):
    """build_clip_inference's s2d-carry path (warp_group=4) must be
    bit-identical to the NHWC fused path (warp_group!=4 falls back)."""
    from tecogan_tpu.engine.inference import build_clip_inference

    cfg4 = TecoConfig(precision="bf16", num_resblock=2, bug_parity=False,
                      warp_group=4)
    cfg2 = cfg4.replace(warp_group=2)
    state = init_state(cfg4.replace(crop_size=8), jax.random.PRNGKey(0))
    clip = jnp.asarray(rng.random((1, 4, 16, 16, 3)).astype(np.float32))
    a = build_clip_inference(cfg4)(state.params_g, clip)
    b = build_clip_inference(cfg2)(state.params_g, clip)
    assert a.shape == (1, 4, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1.5/255.0)


def test_warp_s2d_to_s2d_matches_composition(rng):
    """warp_s2d_carry_to_s2d == channel-permuted s2d of the HR warp."""
    from tecogan_tpu.engine.fused import (
        warp_s2d_carry, warp_s2d_carry_to_s2d, planar_pseudo_flow_coords,
    )

    carry = jnp.asarray(rng.random((2, 6, 8, 48)).astype(np.float32))
    prev_lr = jnp.asarray(rng.random((2, 6, 8, 3)).astype(np.float32))
    ix, iy = planar_pseudo_flow_coords(prev_lr)
    hr = warp_s2d_carry(carry, ix, iy)  # (2, 24, 32, 3)
    got = warp_s2d_carry_to_s2d(carry, ix, iy)  # (2, 6, 8, 48)
    # reference comparison: s2d traversal with (ab)*C + c channel order
    ref = hr.reshape(2, 6, 4, 8, 4, 3)
    ref = jnp.transpose(ref, (0, 1, 3, 2, 4, 5)).reshape(2, 6, 8, 48)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(ref, np.float32)
    )


def test_fused_first_layer_s2d48_matches_unfused(rng):
    """One dense 51-ch conv on the permuted-channel feedback == the
    stride-4 fused_first_layer on the equivalent HR warped image."""
    from tecogan_tpu.engine.fused import fused_first_layer_s2d48

    cfg = TecoConfig(precision="f32", num_resblock=2)
    state = init_state(cfg.replace(crop_size=8), jax.random.PRNGKey(3))
    cur_lr = jnp.asarray(rng.random((1, 6, 8, 3)).astype(np.float32))
    warped_hr = jnp.asarray(rng.random((1, 24, 32, 3)).astype(np.float32))
    ref = fused_first_layer(state.params_g, cur_lr, warped_hr,
                            dtype=jnp.float32)
    fb = warped_hr.reshape(1, 6, 4, 8, 4, 3)
    fb = jnp.transpose(fb, (0, 1, 3, 2, 4, 5)).reshape(1, 6, 8, 48)
    got = fused_first_layer_s2d48(state.params_g, cur_lr, fb,
                                  dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
