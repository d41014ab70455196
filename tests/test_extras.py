"""Tests for the rebuilt dead-stub ops (SURVEY component 22) and the VGG
feature path."""

import numpy as np
import jax
import jax.numpy as jnp

from tecogan_tpu.ops import (
    pixelshuffle,
    random_flip_batch,
    gaussian_2dkernel,
    space_to_depth,
)
from tecogan_tpu.models.vgg import vgg19_features, VGG19


def test_pixelshuffle_inverts_space_to_depth(rng):
    x = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    packed = space_to_depth(x, block=2)
    back = pixelshuffle(packed, scale=2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0)


def test_random_flip_batch(rng):
    x = jnp.asarray(rng.random((4, 3, 5, 6)).astype(np.float32))
    decision = jnp.asarray([0.1, 0.9, 0.2, 0.8])
    out = np.asarray(random_flip_batch(x, decision))
    np.testing.assert_allclose(out[0], np.asarray(x)[0, :, :, ::-1])
    np.testing.assert_allclose(out[1], np.asarray(x)[1])


def test_gaussian_kernel_normalized():
    k = gaussian_2dkernel(5, 1.0)
    assert k.shape == (5, 5)
    np.testing.assert_allclose(k.sum(), 1.0, atol=1e-12)
    assert k[2, 2] == k.max()


def test_vgg19_slim_features_normalized(rng):
    v = VGG19()
    x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    params = v.init(jax.random.PRNGKey(0), x)["params"]
    feats = vgg19_features(params, x, deep_list=("vgg_19/conv2_2",))
    f = feats["vgg_19/conv2_2"]
    norms = np.linalg.norm(np.asarray(f), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
