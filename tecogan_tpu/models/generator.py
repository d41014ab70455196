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

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 51) -> (B, 4H, 4W, out_channels) in [0, 1]."""
        dt = self.dtype
        net = nn.relu(Conv(64, 3, 1, dtype=dt, name="conv_in")(x))
        for i in range(self.num_resblock):
            net = ResidualBlock(64, dtype=dt, name=f"resblock_{i}")(net) + net
        net = nn.relu(ConvTranspose2x(64, dtype=dt, name="up1")(net))
        # used as plain conv stacks in the reference's Sequential trunk
        net = ResidualBlock(64, dtype=dt, name="trunk_rb1")(net)
        net = ResidualBlock(128, dtype=dt, name="trunk_rb2")(net)
        net = nn.relu(ConvTranspose2x(128, dtype=dt, name="up2")(net))
        net = nn.relu(Conv(64, 3, 1, dtype=dt, name="conv_hr")(net))
        net = Conv(self.out_channels, 3, 1, dtype=dt, name="conv_out")(net)
        return nn.sigmoid(net.astype(jnp.float32))

    @staticmethod
    def input_channels(sr_channels: int = 3, block: int = 4) -> int:
        return sr_channels + sr_channels * block * block  # 3 + 48 = 51
