"""FNet optical-flow estimator (reference code/models.py:22-50).

The reference keeps FNet as dead code (every call site commented out:
main.py:231,244-245; SURVEY.md component 11) and uses the pseudo-flow
instead.  We implement it fully and gate it behind config so the framework
can run the paper-faithful flow-warped recurrence as an option.

U-Net-ish: 4 down blocks (conv,lrelu,conv,lrelu,maxpool) 3->32->64->128->256,
4 up blocks (conv,lrelu,conv,lrelu,bilinear 2x) ->512->256->128->64,
output convs 64->32->2, tanh(.)*24 flow range.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv, lrelu
from ..ops.resize import upscale_two


def _maxpool2(x):
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class _DownBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = lrelu(Conv(self.features, 3, 1, dtype=self.dtype)(x))
        x = lrelu(Conv(self.features, 3, 1, dtype=self.dtype)(x))
        return _maxpool2(x)


class _UpBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = lrelu(Conv(self.features, 3, 1, dtype=self.dtype)(x))
        x = lrelu(Conv(self.features, 3, 1, dtype=self.dtype)(x))
        return upscale_two(x)


class FNet(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) frame pair/stack -> (B, H, W, 2) flow in [-24, 24]."""
        dt = self.dtype
        net = _DownBlock(32, dtype=dt)(x)
        net = _DownBlock(64, dtype=dt)(net)
        net = _DownBlock(128, dtype=dt)(net)
        net = _DownBlock(256, dtype=dt)(net)
        net = _UpBlock(512, dtype=dt)(net)
        net = _UpBlock(256, dtype=dt)(net)
        net = _UpBlock(128, dtype=dt)(net)
        net = _UpBlock(64, dtype=dt)(net)
        net = lrelu(Conv(32, 3, 1, dtype=dt)(net))
        net = Conv(2, 3, 1, dtype=dt)(net)
        return jnp.tanh(net.astype(jnp.float32)) * 24.0
