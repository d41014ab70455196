"""Model topology tests: shapes, param counts vs the reference layer spec,
and torch-primitive parity for the transposed-conv padding scheme."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from tecogan_tpu.models import Generator, Discriminator, FNet, VGG19
from tecogan_tpu.models.layers import ConvTranspose2x


def test_convtranspose2x_matches_torch(rng):
    """Our lhs-dilated conv == torch ConvTranspose2d(k=3,s=2,p=1,op=1)
    (reference conv2_tran, ops.py:45-54) after kernel flip + I/O swap."""
    x = rng.standard_normal((2, 5, 7, 4)).astype(np.float32)  # NHWC
    mod = ConvTranspose2x(features=6)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert y.shape == (2, 10, 14, 6)

    # torch: weight (in, out, kh, kw); ours HWIO forward-conv orientation.
    k = np.asarray(params["params"]["kernel"])  # (3,3,4,6)
    b = np.asarray(params["params"]["bias"])
    w_torch = np.transpose(k[::-1, ::-1, :, :], (2, 3, 0, 1))  # flip, -> (in,out,kh,kw)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ref = F.conv_transpose2d(
        xt, torch.from_numpy(w_torch.copy()), torch.from_numpy(b),
        stride=2, padding=1, output_padding=1,
    ).numpy()
    np.testing.assert_allclose(np.transpose(y, (0, 3, 1, 2)), ref, atol=1e-4)


def test_generator_shapes(rng):
    g = Generator(num_resblock=4)
    x = jnp.asarray(rng.random((2, 8, 8, 51)).astype(np.float32))
    params = g.init(jax.random.PRNGKey(0), x)
    y = g.apply(params, x)
    assert y.shape == (2, 32, 32, 3)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0  # sigmoid output


def test_generator_param_count_matches_reference_topology():
    """Reference generator (models.py:61-86) with 16 resblocks:
    conv_in 51*64*9+64; 16 x (64*64*9+64 + 64*64*9); up1 64*64*9+64;
    trunk_rb1 64*64*9+64 + 64*64*9; trunk_rb2 64*128*9+128 + 128*128*9;
    up2 128*128*9+128; conv_hr 128*64*9+64; conv_out 64*3*9+3."""
    expected = (
        (51 * 64 * 9 + 64)
        + 16 * (64 * 64 * 9 + 64 + 64 * 64 * 9)
        + (64 * 64 * 9 + 64)
        + (64 * 64 * 9 + 64 + 64 * 64 * 9)
        + (64 * 128 * 9 + 128 + 128 * 128 * 9)
        + (128 * 128 * 9 + 128)
        + (128 * 64 * 9 + 64)
        + (64 * 3 * 9 + 3)
    )
    g = Generator(num_resblock=16)
    params = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 51)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n == expected


def test_discriminator_shapes_and_features(rng):
    d = Discriminator(resblocks=2, channels=32)
    x = jnp.asarray(rng.random((2, 128, 128, 27)).astype(np.float32))
    variables = d.init(jax.random.PRNGKey(0), x, train=True)
    (score, layers), updates = d.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert score.shape == (2, 1)
    assert float(score.min()) >= 0.0 and float(score.max()) <= 1.0
    assert len(layers) == 4
    # stride-2 cascade: 128 -> 64 -> 32 -> 16 -> 8 -> 4
    assert layers[0].shape == (2, 64, 64, 64)
    assert layers[1].shape == (2, 32, 32, 32)
    assert layers[2].shape == (2, 16, 16, 32)
    assert layers[3].shape == (2, 8, 8, 64)
    assert "batch_stats" in updates


def test_discriminator_any_crop_size(rng):
    """SURVEY.md §5.1.6: fc size must be inferred, not hardcoded to 48."""
    d = Discriminator(resblocks=1, channels=16)
    x = jnp.asarray(rng.random((1, 256, 256, 27)).astype(np.float32))
    variables = d.init(jax.random.PRNGKey(0), x, train=True)
    (score, _), _ = d.apply(variables, x, train=True, mutable=["batch_stats"])
    assert score.shape == (1, 1)


def test_fnet_shapes(rng):
    f = FNet()
    x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    params = f.init(jax.random.PRNGKey(0), x)
    flow = f.apply(params, x)
    assert flow.shape == (1, 32, 32, 2)
    assert float(jnp.abs(flow).max()) <= 24.0  # tanh * 24 (models.py:48)


def test_vgg19_endpoints(rng):
    v = VGG19()
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    params = v.init(jax.random.PRNGKey(0), x)
    out, endpoints = v.apply(params, x)
    assert "vgg_19/conv2_2" in endpoints
    assert "vgg_19/conv4_4" in endpoints
    assert endpoints["vgg_19/conv2_2"].shape == (1, 32, 32, 128)
    assert out.shape == (1, 2, 2, 512)
