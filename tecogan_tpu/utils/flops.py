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
