"""Torch-checkpoint conversion parity.

Builds torch models as *test fixtures* with the reference's state-dict key
layout (documented at code/models.py:61-146 — attribute names conv/resids/
conv_trans/output and block1..5/resids1..3/fc), converts their weights with
tools/convert_torch_ckpt.py, and asserts our JAX models produce the same
outputs.  This is the bit-parity bridge: a user's reference generator.pt
must drop into this framework and produce matching frames.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

sys.path.insert(0, "/root/repo/tools")
from convert_torch_ckpt import convert_generator, convert_discriminator

from tecogan_tpu.models import Generator, Discriminator


def _conv(i, o, k=3, s=1, bias=True):
    return nn.Conv2d(i, o, k, s, padding=(k - 1) // 2, bias=bias)


def _resblock_t(i, o):
    return nn.Sequential(_conv(i, o), nn.ReLU(), _conv(o, o, bias=False))


class TorchGenFixture(nn.Module):
    """State-dict-compatible stand-in for the reference generator
    (keys: conv.0, resids.N.{0,2}, conv_trans.{0,2,3,4,6}, output)."""

    def __init__(self, num_resblock=4):
        super().__init__()
        self.conv = nn.Sequential(_conv(51, 64), nn.ReLU())
        self.resids = nn.ModuleList(
            [_resblock_t(64, 64) for _ in range(num_resblock)]
        )
        self.conv_trans = nn.Sequential(
            nn.ConvTranspose2d(64, 64, 3, 2, padding=1, output_padding=1),
            nn.ReLU(),
            _resblock_t(64, 64),
            _resblock_t(64, 128),
            nn.ConvTranspose2d(128, 128, 3, 2, padding=1, output_padding=1),
            nn.ReLU(),
            _conv(128, 64),
            nn.ReLU(),
        )
        self.output = _conv(64, 3)

    def forward(self, x):
        net = self.conv(x)
        for blk in self.resids:
            net = blk(net) + net
        net = self.conv_trans(net)
        return torch.sigmoid(self.output(net))


class TorchDiscFixture(nn.Module):
    """State-dict-compatible stand-in for the reference discriminator
    (keys: conv.0, block1..5.{0,1}, resids1..3.N.{0,1}, fc)."""

    def __init__(self, resblocks=2, channels=32):
        super().__init__()

        def dblock(i, o):
            return nn.Sequential(
                nn.Conv2d(i, o, 4, 2, padding=1, bias=False),
                nn.BatchNorm2d(o, eps=0.001),
                nn.LeakyReLU(0.2),
            )

        def resgroup(c):
            return nn.ModuleList(
                [
                    nn.Sequential(_resblock_t(c, c), nn.BatchNorm2d(c, eps=0.001))
                    for _ in range(resblocks)
                ]
            )

        self.conv = nn.Sequential(_conv(27, 64), nn.LeakyReLU(0.2))
        self.block1 = dblock(64, 64)
        self.resids1 = resgroup(64)
        self.block2 = dblock(64, channels)
        self.resids2 = resgroup(channels)
        self.block3 = dblock(channels, channels)
        self.resids3 = resgroup(channels)
        self.block4 = dblock(channels, 64)
        self.block5 = dblock(64, 3)
        self.fc = nn.Linear(48, 1)

    def forward(self, x):
        feats = []
        net = self.conv(x)
        net = self.block1(net)
        for b in self.resids1:
            net = b(net) + net
        feats.append(net)
        net = self.block2(net)
        for b in self.resids2:
            net = b(net) + net
        feats.append(net)
        net = self.block3(net)
        for b in self.resids3:
            net = b(net) + net
        feats.append(net)
        net = self.block4(net)
        feats.append(net)
        net = self.block5(net)
        return torch.sigmoid(self.fc(net.reshape(net.shape[0], -1))), feats


def test_generator_conversion_forward_parity(rng):
    torch.manual_seed(0)
    tg = TorchGenFixture(num_resblock=4).eval()
    params = convert_generator(tg.state_dict(), num_resblock=4)

    x = rng.random((2, 51, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.from_numpy(x)).numpy()

    g = Generator(num_resblock=4)
    x_nhwc = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
    out = g.apply({"params": jax.tree.map(jnp.asarray, params)}, x_nhwc)
    got = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_discriminator_conversion_forward_parity(rng):
    torch.manual_seed(0)
    td = TorchDiscFixture(resblocks=2, channels=32).train()
    params, stats = convert_discriminator(td.state_dict(), resblocks=2)

    x = rng.random((2, 27, 128, 128)).astype(np.float32)
    with torch.no_grad():
        ref_score, ref_feats = td(torch.from_numpy(x))

    d = Discriminator(resblocks=2, channels=32)
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, stats),
    }
    x_nhwc = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
    (score, feats), _ = d.apply(
        variables, x_nhwc, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(score), ref_score.numpy(), atol=5e-5
    )
    for mine, theirs in zip(feats, ref_feats):
        got = np.transpose(np.asarray(mine), (0, 3, 1, 2))
        np.testing.assert_allclose(got, theirs.numpy(), atol=5e-4)
