"""Analytic FLOP accounting for the generator (MFU reporting).

Counts the USEFUL multiply-accumulates the model's math requires —
transposed convs are counted at input-pixel granularity (each input pixel
multiplies every kernel tap once: k*k*Cin*Cout per input pixel), which is
what the lhs-dilated lowering actually performs after XLA strength-
reduces the inserted zeros.  Elementwise work (warp, sigmoid, relu,
space-to-depth) is excluded: it is bandwidth, not MXU FLOPs.

Topology per models/generator.py (reference code/models.py:61-86).
"""

from __future__ import annotations

# TPU v5e (v5litepod) peak dense bf16 matmul throughput, per chip.
# Public spec: 197 TFLOP/s bf16 (394 TOP/s int8).
TPU_V5E_PEAK_BF16_FLOPS = 197e12


def generator_macs_per_frame(
    h: int, w: int, num_resblock: int = 16, out_channels: int = 3
) -> int:
    """MACs for one generator forward at LR resolution (h, w)."""
    px = h * w
    macs = 0
    macs += 9 * 51 * 64 * px                      # conv_in
    macs += num_resblock * 2 * 9 * 64 * 64 * px   # LR resblocks
    macs += 9 * 64 * 64 * px                      # up1 (convT s2, input px)
    macs += 2 * 9 * 64 * 64 * (4 * px)            # trunk_rb1 @ 2Hx2W
    macs += 9 * (64 * 128 + 128 * 128) * (4 * px)  # trunk_rb2 @ 2Hx2W
    macs += 9 * 128 * 128 * (4 * px)              # up2 (convT s2, input 2Hx2W)
    macs += 9 * 128 * 64 * (16 * px)              # conv_hr @ 4Hx4W
    macs += 9 * 64 * out_channels * (16 * px)     # conv_out @ 4Hx4W
    return macs


def generator_flops_per_frame(h: int, w: int, num_resblock: int = 16) -> float:
    """FLOPs (2 x MACs) for one frame of recurrent inference."""
    return 2.0 * generator_macs_per_frame(h, w, num_resblock)


def discriminator_macs(h4: int, w4: int, resblocks: int = 4,
                       channels: int = 128) -> int:
    """MACs for one discriminator forward on an (h4, w4) 27-channel
    triplet input (models/discriminator.py topology, reference
    code/models.py:97-146).  crop_dt center-crops then zero-pads back
    (train.py:160-179), so the spatial size is unchanged."""
    px = h4 * w4
    C = channels
    macs = 9 * 27 * 64 * px                       # conv_in k3
    macs += 16 * 64 * 64 * (px // 4)              # block1 k4 s2
    macs += resblocks * 2 * 9 * 64 * 64 * (px // 4)
    macs += 16 * 64 * C * (px // 16)              # block2
    macs += resblocks * 2 * 9 * C * C * (px // 16)
    macs += 16 * C * C * (px // 64)               # block3
    macs += resblocks * 2 * 9 * C * C * (px // 64)
    macs += 16 * C * 64 * (px // 256)             # block4
    macs += 16 * 64 * 3 * (px // 1024)            # block5
    macs += 3 * (px // 1024)                      # fc
    return macs


def train_step_macs(
    batch: int, rnn_n: int, crop: int, num_resblock: int = 16,
    discrim_resblocks: int = 4, discrim_channels: int = 128,
    pingpang: bool = False, bug_parity: bool = True,
) -> int:
    """Analytic MACs for one TecoGAN optimizer step (G step + D step).

    Counting rules (the standard fwd/bwd convention):
      * a backward pass costs 2x its forward (input grads + weight
        grads); weight-frozen backprop (through D to G's output) costs
        1x extra (input grads only);
      * G unrolls T_u = 2*RNN_N - 1 frames with ping-pong else RNN_N
        (reference train.py:56-62);
      * D sees T_u//3 triplets per branch; the D step runs real + fake
        branches fwd+bwd; the G step runs the fake branch fwd (+input
        grads when the adversarial gradient flows, i.e. fixed mode —
        bug_parity detaches it, train.py:288);
      * elementwise work (warp, losses, EMA) is bandwidth, not MXU.
    """
    t_u = 2 * rnn_n - 1 if pingpang else rnn_n
    gmacs = generator_macs_per_frame(crop, crop, num_resblock)
    dmacs = discriminator_macs(4 * crop, 4 * crop, discrim_resblocks,
                               discrim_channels)
    n_trip = t_u // 3

    total = 3 * batch * t_u * gmacs                      # G fwd+bwd
    total += 2 * batch * n_trip * dmacs * 3              # D step, 2 branches
    total += batch * n_trip * dmacs * (1 if bug_parity else 2)  # G step's D
    return total


def train_mfu(ms_per_step: float, batch: int, rnn_n: int, crop: int,
              num_resblock: int = 16, discrim_resblocks: int = 4,
              discrim_channels: int = 128, pingpang: bool = False,
              bug_parity: bool = True,
              peak_flops: float = TPU_V5E_PEAK_BF16_FLOPS) -> dict:
    """Model-FLOPs-utilization of one training step (vs bf16 peak)."""
    flops = 2.0 * train_step_macs(
        batch, rnn_n, crop, num_resblock, discrim_resblocks,
        discrim_channels, pingpang, bug_parity)
    achieved = flops / (ms_per_step / 1e3)
    return {
        "train_tflop_per_step": flops / 1e12,
        "achieved_tflops": achieved / 1e12,
        "mfu": achieved / peak_flops,
    }


def inference_mfu(fps: float, h: int, w: int, num_resblock: int = 16,
                  peak_flops: float = TPU_V5E_PEAK_BF16_FLOPS) -> dict:
    """Model-FLOPs-utilization of the recurrent inference pipeline."""
    fpf = generator_flops_per_frame(h, w, num_resblock)
    achieved = fps * fpf
    return {
        "gen_tflop_per_frame": fpf / 1e12,
        "achieved_tflops": achieved / 1e12,
        "mfu": achieved / peak_flops,
    }
