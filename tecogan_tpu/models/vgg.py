"""VGG-19 feature extractor for the perceptual loss (reference
code/ops.py:144-213 + VGG19_slim at code/train.py:30-45).

The reference's implementation is broken when enabled (missing kernel-size
args at ops.py:153-166 crash with TypeError; the feature norm at
train.py:41 adds a float to a (values, indices) tuple; no pretrained weights
are ever loaded despite --vgg_ckpt).  We implement the *intent*
(SURVEY.md §5.1 / component 15): full VGG-19 conv stack capturing every
conv/pool activation, channel-wise L2 feature normalization, and weight
loading from a torchvision-style state dict via
tools/convert_torch_ckpt.py.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv

# (name, out_channels) per VGG-19 conv layer, pools after each group.
_VGG19_CFG = [
    ("conv1_1", 64), ("conv1_2", 64), ("pool1", None),
    ("conv2_1", 128), ("conv2_2", 128), ("pool2", None),
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256), ("pool3", None),
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512), ("pool4", None),
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), ("conv5_4", 512), ("pool5", None),
]

VGG_MEAN = (123.68, 116.78, 103.94)  # reference train.py:6


class VGG19(nn.Module):
    """Returns (final pool, dict of every 'vgg_19/<name>' activation) like the
    reference's end_points dict (ops.py:168-213)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        end_points: Dict[str, jnp.ndarray] = {}
        net = x
        for name, ch in _VGG19_CFG:
            if ch is None:
                net = nn.max_pool(net, window_shape=(2, 2), strides=(2, 2))
            else:
                net = nn.relu(Conv(ch, 3, 1, dtype=self.dtype, name=name)(net))
            end_points[f"vgg_19/{name}"] = net
        return net, end_points


SURROGATE_SEED = 20260816


def fixed_seed_vgg_params(seed: int = SURROGATE_SEED):
    """Deterministic surrogate VGG-19 parameters.

    This image has zero egress, so torchvision's pretrained VGG-19 weights
    cannot be fetched; random-feature perceptual losses are a documented,
    reasonable stand-in (random convnet features still measure perceptual
    structure).  Every run regenerates the SAME weights from a fixed seed,
    so metrics are comparable across runs/machines.  When real weights are
    available, convert them with tools/convert_torch_ckpt.py --arch vgg19
    and pass --vgg_ckpt <file> instead.
    """
    import jax

    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    return VGG19().init(jax.random.PRNGKey(seed), dummy)["params"]


def load_vgg_params(vgg_ckpt):
    """Resolve --vgg_ckpt: a converted .ckpt path, or the literal string
    'surrogate' (fixed-seed weights, see fixed_seed_vgg_params)."""
    if vgg_ckpt == "surrogate":
        return fixed_seed_vgg_params()
    from ..utils.checkpoint import load_flat, unflatten

    flat, _ = load_flat(vgg_ckpt)
    tree = unflatten(flat)
    tree = tree.get("model_state_dict", tree)
    return jax.tree.map(jnp.asarray, tree)


def vgg19_features(
    vgg_params, images01_nhwc: jnp.ndarray, deep_list=None, norm_flag: bool = True,
    dtype: Any = jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """VGG19_slim (reference train.py:30-45): scale [0,1] images to [0,255],
    subtract VGG_MEAN, extract features, optionally unit-normalize over
    channels (the working version of the reference's broken norm)."""
    x = images01_nhwc * 255.0 - jnp.asarray(VGG_MEAN, dtype=images01_nhwc.dtype)
    _, end_points = VGG19(dtype=dtype).apply({"params": vgg_params}, x)
    results = {}
    for key, feat in end_points.items():
        if deep_list is None or key in deep_list:
            if norm_flag:
                norm = jnp.sqrt(
                    jnp.sum(jnp.square(feat), axis=-1, keepdims=True) + 1e-12
                )
                results[key] = feat / norm
            else:
                results[key] = feat
    return results
