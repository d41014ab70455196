"""Dt-triplet assembly parity vs torch primitives.

Replays the reference's discriminator-input assembly
(code/train.py:129-199) step by step with torch ops (reshape/cat/
grid_sample/interpolate/pad) on the SAME inputs and generator outputs,
and checks our ``assemble_triplets`` produces identical 27-channel real
and fake tensors.  This covers the scrambled raw-view semantics
(SURVEY §5.1.1/7) end to end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.engine.losses import (
    assemble_triplets,
    pseudo_flow_sequence,
)


def _torch_assembly(r_inputs, r_targets, gen_outputs, crop_size, crop_dt=0.75):
    """Reference train.py:129-199 with torch primitives (fp32, no autocast;
    our parity path keeps grids fp16-rounded, so the fake branch is
    compared against a fp16-rounded T_vel here too)."""
    B, T = r_inputs.shape[:2]
    H, W = crop_size, crop_size
    H4, W4 = 4 * H, 4 * W
    t_size = 3 * (T // 3)
    t_batch = B * t_size // 3

    r_inputs = torch.from_numpy(r_inputs)
    r_targets = torch.from_numpy(r_targets)
    gen_outputs = torch.from_numpy(gen_outputs)

    # pseudo-flow (train.py:71-77)
    frames_pre = r_inputs[:, :-1].reshape(B * (T - 1), 3, H, W)
    up = F.interpolate(frames_pre * 4.0, scale_factor=4, mode="bilinear")
    gen_flow = up[:, 0:2].reshape(B, T - 1, 2, H4, W4)

    t_gen = gen_outputs[:, :t_size].reshape(B * t_size, 3, H4, W4)
    t_tgt = r_targets[:, :t_size].reshape(B * t_size, 3, H4, W4)

    # backward flow (train.py:139-149)
    back = torch.cat([r_inputs[:, 2:t_size:3], r_inputs[:, 1:t_size:3]], dim=1)
    back = back.reshape(t_batch, 6, H, W)
    back_up = F.interpolate(back[0:B] * 4.0, scale_factor=4, mode="bilinear")
    v_nxt = back_up.reshape(B, t_size // 3, 2, H4, W4) * 2.0 - 1.0  # preprocess

    v_pre = gen_flow[:, 0:t_size:3]
    v_mid = torch.zeros_like(v_pre)
    t_vel = torch.stack([v_pre, v_mid, v_nxt], dim=2)
    t_vel = t_vel.reshape(B * t_size, H4, W4, 2)

    # crop_dt geometry (train.py:160-164)
    crop_sz = int(H4 * crop_dt)
    off = (H4 - crop_sz) // 2
    crop_sz = H4 - off * 2

    def crop_pad(x):
        c = x[:, :, off : off + crop_sz, off : off + crop_sz]
        return F.pad(c, (off, off, off, off))

    before_warp = t_tgt.reshape(t_batch, 9, H4, W4)
    t_input = r_inputs[:, :t_size].reshape(t_batch, 9, H, W)
    input_hi = F.interpolate(t_input, scale_factor=4, mode="bilinear")

    real_warp = F.grid_sample(
        t_tgt, t_vel, mode="bilinear", padding_mode="zeros", align_corners=False
    ).reshape(t_batch, 9, H4, W4)
    real_in = torch.cat([before_warp, crop_pad(real_warp), input_hi], dim=1)

    fake_vel = t_vel.half().float()  # T_vel.half() at train.py:187
    fake_warp = F.grid_sample(
        t_gen, fake_vel, mode="bilinear", padding_mode="zeros", align_corners=False
    ).reshape(t_batch, 9, H4, W4)
    fake_in = torch.cat([before_warp, crop_pad(fake_warp), input_hi], dim=1)
    return real_in.numpy(), fake_in.numpy()


def test_triplet_assembly_matches_torch(rng):
    cfg = TecoConfig(crop_size=8, RNN_N=9, bug_parity=True)
    B, T, H = 2, 9, 8
    r_inputs = rng.random((B, T, 3, H, H)).astype(np.float32)
    r_targets = rng.random((B, T, 3, 4 * H, 4 * H)).astype(np.float32)
    gen_outputs = rng.random((B, T, 3, 4 * H, 4 * H)).astype(np.float32)

    gen_flow = pseudo_flow_sequence(jnp.asarray(r_inputs), (H, H))
    real_in, fake_in = assemble_triplets(
        jnp.asarray(r_inputs), jnp.asarray(r_targets),
        jnp.asarray(gen_outputs), gen_flow, cfg,
    )

    ref_real, ref_fake = _torch_assembly(r_inputs, r_targets, gen_outputs, H)
    assert real_in.shape == ref_real.shape == (6, 27, 32, 32)
    np.testing.assert_allclose(np.asarray(real_in), ref_real, atol=1e-4)
    # fake branch rounds the grid through fp16 (train.py:187); the ~1e-5
    # bilinear-resize backend difference (jax.image vs torch) occasionally
    # lands on opposite sides of an fp16 rounding boundary, shifting a
    # sampled coordinate by one ulp — bounded by one bilinear step.
    np.testing.assert_allclose(np.asarray(fake_in), ref_fake, atol=2e-2)
    mismatch = np.mean(
        np.abs(np.asarray(fake_in) - ref_fake) > 1e-4
    )
    assert mismatch < 0.01  # >99% of elements bit-agree pre-noise


def test_triplet_assembly_pingpang_branch(rng):
    """Ping-pong VNxt uses flipped forward flows (train.py:152-154)."""
    cfg = TecoConfig(crop_size=8, RNN_N=5, bug_parity=True, pingpang=True)
    B, T, H = 1, 9, 8  # extended length 2*5-1
    r_inputs = rng.random((B, T, 3, H, H)).astype(np.float32)
    r_targets = rng.random((B, T, 3, 4 * H, 4 * H)).astype(np.float32)
    gen_outputs = rng.random((B, T, 3, 4 * H, 4 * H)).astype(np.float32)
    gen_flow = pseudo_flow_sequence(jnp.asarray(r_inputs), (H, H))
    real_in, fake_in = assemble_triplets(
        jnp.asarray(r_inputs), jnp.asarray(r_targets),
        jnp.asarray(gen_outputs), gen_flow, cfg,
    )
    assert real_in.shape == (3, 27, 32, 32)
    assert np.isfinite(np.asarray(real_in)).all()
