"""Spatio-temporal discriminator (merged Ds+Dt; reference code/models.py:97-146).

Input (B, H, W, 27): three triplets of 3 RGB frames — [before-warp targets,
warped targets, bilinear-upscaled LR] (assembled at code/train.py:175-179).

Topology:
  conv3x3 27->64 + lrelu(0.2)                         (models.py:102)
  block1: conv4x4 s2 no-bias -> BN -> lrelu           (models.py:90-94,104)
  resids1: R x [BN(resblock(64)) + skip]              (models.py:105-106)   -> feature 1
  block2: conv4x4 s2 -> BN -> lrelu, 64->C            (models.py:109)
  resids2: R x [BN(resblock(C)) + skip]               (models.py:110-111)   -> feature 2
  block3: conv4x4 s2 C->C + resids3                   (models.py:114-117)   -> feature 3
  block4: conv4x4 s2 C->64                            (models.py:119)       -> feature 4
  block5: conv4x4 s2 64->3                            (models.py:121)
  flatten -> dense(->1, xavier) -> sigmoid            (models.py:123,143-145)

Fix over the reference (SURVEY.md §5.1.6): the reference hardcodes the fc
input size to 48 (128x128 inputs only); we infer it from the actual shape,
so any crop size works.

Returns (score (B, 1), [4 intermediate feature maps]) for the
feature-matching layer loss (code/train.py:205-237).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv, Dense, ResidualBlock, lrelu


class _DiscBlock(nn.Module):
    """conv4x4 s2 (no bias) -> BN -> lrelu (reference discriminator_block,
    models.py:90-94)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = Conv(self.features, 4, 2, use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-3,
            dtype=self.dtype,
        )(y)
        return lrelu(y)


class _ResidBNGroup(nn.Module):
    """R x [BN(conv-relu-conv) + skip] (reference models.py:105-106)."""

    features: int
    count: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i in range(self.count):
            y = ResidualBlock(self.features, dtype=self.dtype, name=f"rb_{i}")(x)
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-3,
                dtype=self.dtype, name=f"bn_{i}",
            )(y)
            x = y + x
        return x


class Discriminator(nn.Module):
    resblocks: int = 4
    channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        dt = self.dtype
        layer_list = []
        net = lrelu(Conv(64, 3, 1, dtype=dt, name="conv_in")(x))
        net = _DiscBlock(64, dtype=dt, name="block1")(net, train)
        net = _ResidBNGroup(64, self.resblocks, dtype=dt, name="resids1")(net, train)
        layer_list.append(net)
        net = _DiscBlock(self.channels, dtype=dt, name="block2")(net, train)
        net = _ResidBNGroup(self.channels, self.resblocks, dtype=dt, name="resids2")(net, train)
        layer_list.append(net)
        net = _DiscBlock(self.channels, dtype=dt, name="block3")(net, train)
        net = _ResidBNGroup(self.channels, self.resblocks, dtype=dt, name="resids3")(net, train)
        layer_list.append(net)
        net = _DiscBlock(64, dtype=dt, name="block4")(net, train)
        layer_list.append(net)
        net = _DiscBlock(3, dtype=dt, name="block5")(net, train)
        # Flatten in NCHW order (torch net.view(B, -1) on NCHW,
        # models.py:143) so reference fc weights convert 1:1; size is
        # inferred, not hardcoded (fixes SURVEY §5.1.6).
        net = jnp.transpose(net, (0, 3, 1, 2)).reshape(net.shape[0], -1)
        score = nn.sigmoid(Dense(1, dtype=dt, name="fc")(net).astype(jnp.float32))
        return score, layer_list
