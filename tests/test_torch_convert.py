"""Torch-checkpoint conversion parity — against the REAL reference modules.

Earlier revisions tested against builder-authored torch fixtures with the
same assumed state-dict layout, which was circular (a layout misreading
would still pass).  Now the actual reference models are imported from
/root/reference/code via tests/_refbridge.py; end-to-end conversion parity
for the default shapes lives in tests/test_reference_parity.py.  This file
covers the converter surface those tests don't: non-default model sizes and
the VGG19 state-dict mapping.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

sys.path.insert(0, "/root/repo/tools")
from convert_torch_ckpt import (
    convert_generator,
    convert_discriminator,
    convert_vgg19,
    _VGG_TORCHVISION_IDX,
)

from _refbridge import load_reference
from test_reference_parity import _args_ns
from tecogan_tpu.config import TecoConfig
from tecogan_tpu.models import Generator, Discriminator
from tecogan_tpu.models.vgg import VGG19, _VGG19_CFG


def test_generator_conversion_nondefault_size(rng):
    """Conversion must track num_resblock (reference ModuleList length)."""
    ref_models, _, _ = load_reference()
    cfg = TecoConfig(num_resblock=7, precision="fp32")
    torch.manual_seed(3)
    tg = ref_models.generator(3, args=_args_ns(cfg)).eval()
    params = convert_generator(tg.state_dict(), num_resblock=7)

    x = rng.random((1, 51, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.from_numpy(x)).numpy()
    out = Generator(num_resblock=7).apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)),
    )
    got = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_discriminator_conversion_nondefault_size(rng):
    ref_models, _, _ = load_reference()
    cfg = TecoConfig(discrim_resblocks=2, discrim_channels=32, precision="fp32")
    torch.manual_seed(4)
    td = ref_models.discriminator(args=_args_ns(cfg)).train()
    params, stats = convert_discriminator(td.state_dict(), resblocks=2)

    x = rng.random((2, 27, 128, 128)).astype(np.float32)
    with torch.no_grad():
        ref_score, ref_feats = td(torch.from_numpy(x))

    d = Discriminator(resblocks=2, channels=32)
    (score, feats), _ = d.apply(
        {
            "params": jax.tree.map(jnp.asarray, params),
            "batch_stats": jax.tree.map(jnp.asarray, stats),
        },
        jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)),
        train=True,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(score), ref_score.numpy(), atol=5e-5)
    for mine, theirs in zip(feats, ref_feats):
        got = np.transpose(np.asarray(mine), (0, 3, 1, 2))
        np.testing.assert_allclose(got, theirs.numpy(), atol=5e-4)


def test_converted_params_are_copies():
    """state_dict().numpy() views torch storage; the converter must copy so
    later in-place torch updates (optimizer steps) can't mutate converted
    params (jnp.asarray may alias numpy buffers zero-copy on CPU)."""
    ref_models, _, _ = load_reference()
    cfg = TecoConfig(num_resblock=1, precision="fp32")
    torch.manual_seed(5)
    tg = ref_models.generator(3, args=_args_ns(cfg))
    params = convert_generator(tg.state_dict(), num_resblock=1)
    before = params["conv_in"]["bias"].copy()
    with torch.no_grad():
        for p in tg.parameters():
            p.add_(1.0)
    np.testing.assert_array_equal(params["conv_in"]["bias"], before)


def _torchvision_style_vgg19_features():
    """A features-Sequential with torchvision's vgg19 indexing (conv at
    0,2,5,...,34 with ReLU/MaxPool between) for converter testing."""
    layers = []
    in_ch = 3
    for name, ch in _VGG19_CFG:
        if ch is None:
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, ch, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_ch = ch
    return nn.Sequential(*layers)


def test_vgg19_conversion_forward_parity(rng):
    torch.manual_seed(1)
    feats = _torchvision_style_vgg19_features().eval()
    sd = {f"features.{k}": v for k, v in feats.state_dict().items()}
    conv_indices = sorted(
        int(k.split(".")[1]) for k in sd if k.endswith(".weight")
    )
    assert conv_indices == _VGG_TORCHVISION_IDX

    params = convert_vgg19(sd)
    x = rng.random((1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = feats(torch.from_numpy(x)).numpy()
    out, _ = VGG19().apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)),
    )
    got = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, atol=1e-4)
