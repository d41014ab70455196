"""FRVSR-style recurrent SR generator (reference code/models.py:61-86).

Topology (4x SR, NHWC):
  input (B, H, W, 51): 3 LR RGB + 48 space-to-depth of the warped previous
  SR output (zeros for frame 0; main.py:191-193)
  -> conv3x3 51->64 + ReLU                     (models.py:68)
  -> num_resblock x [conv-ReLU-conv + skip]    (models.py:70,81-82)
  -> convT 3x3 s2 64->64 + ReLU                (models.py:72)
  -> resblock(64)   as plain conv stack        (models.py:73, no skip)
  -> resblock(64->128) as plain conv stack     (models.py:73, no skip)
  -> convT 3x3 s2 128->128 + ReLU              (models.py:74)
  -> conv3x3 128->64 + ReLU                    (models.py:75)
  -> conv3x3 64->out + sigmoid                 (models.py:76,86)

Per the reference README (README.md:19) there is NO bilinear skip
connection — the network learns the full 4x upsample.

``tail`` is exposed separately so the fused inference path
(engine/fused.py) can compute the first layer as
conv_lr(lr) + stride-4-conv(warped HR) — mathematically identical to
space-to-depth + concat + conv_in but without materializing the
48-channel feedback tensor.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv, ConvTranspose2x, ResidualBlock


class Generator(nn.Module):
    num_resblock: int = 16
    out_channels: int = 3
    dtype: Any = jnp.float32
    # output/sigmoid dtype: f32 by default; the fast inference path carries
    # bf16 SR state between frames (quantization floor ~50 dB, far above
    # VSR PSNR levels)
    out_dtype: Any = jnp.float32

    def setup(self):
        dt = self.dtype
        self.conv_in = Conv(64, 3, 1, dtype=dt, name="conv_in")
        self.resblocks = [
            ResidualBlock(64, dtype=dt, name=f"resblock_{i}")
            for i in range(self.num_resblock)
        ]
        self.up1 = ConvTranspose2x(64, dtype=dt, name="up1")
        self.trunk_rb1 = ResidualBlock(64, dtype=dt, name="trunk_rb1")
        self.trunk_rb2 = ResidualBlock(128, dtype=dt, name="trunk_rb2")
        self.up2 = ConvTranspose2x(128, dtype=dt, name="up2")
        self.conv_hr = Conv(64, 3, 1, dtype=dt, name="conv_hr")
        self.conv_out = Conv(self.out_channels, 3, 1, dtype=dt, name="conv_out")

    def __call__(self, x):
        """x: (B, H, W, 51) -> (B, 4H, 4W, out_channels) in [0, 1]."""
        return self.tail(nn.relu(self.conv_in(x)))

    def tail(self, net):
        """Everything after the first activation: net (B, H, W, 64) ->
        (B, 4H, 4W, out) in [0, 1]."""
        net = self.conv_out(self.tail_features(net))
        return nn.sigmoid(net.astype(self.out_dtype))

    def tail_features(self, net):
        """tail up to (and including) the conv_hr activation:
        (B, H, W, 64) -> (B, 4H, 4W, 64).  Split out so the fused
        inference path (engine/fused.py) can swap conv_out for its
        space-to-depth stride-4 formulation."""
        for block in self.resblocks:
            net = block(net) + net
        net = nn.relu(self.up1(net))
        # used as plain conv stacks in the reference's Sequential trunk
        net = self.trunk_rb1(net)
        net = self.trunk_rb2(net)
        net = nn.relu(self.up2(net))
        return nn.relu(self.conv_hr(net))

    @staticmethod
    def input_channels(sr_channels: int = 3, block: int = 4) -> int:
        return sr_channels + sr_channels * block * block  # 3 + 48 = 51
