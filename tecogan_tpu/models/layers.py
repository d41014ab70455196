"""Shared layer building blocks (NHWC, TPU-first).

Semantics mirror the reference's layer factories (code/ops.py:45-88):
  * conv2: Conv2d k, stride s, padding (k-1)//2 — cross-correlation.
  * conv2_tran: ConvTranspose2d k=3, s=2, p=1, output_padding=1 (exact 2x).
  * batchnorm: BatchNorm2d(eps=1e-3), train-mode batch stats.
  * denselayer: Linear with xavier_uniform weight init.
Initializers reproduce torch defaults (kaiming_uniform(a=sqrt(5)) for conv
weights, U(±1/sqrt(fan_in)) for biases) so training dynamics start from the
same distribution family as the reference.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(±sqrt(1/fan_in)).

    shape is HWIO: fan_in = kh * kw * in_ch.
    """
    kh, kw, in_ch, _ = shape
    fan_in = kh * kw * in_ch
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init_for(fan_in: int) -> Callable:
    bound = math.sqrt(1.0 / fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv(nn.Module):
    """3x3/kxk conv, torch-style 'same-ish' padding (k-1)//2 (ops.py:57-63)."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        pad = (self.kernel - 1) // 2
        kernel = self.param(
            "kernel",
            torch_conv_kernel_init,
            (self.kernel, self.kernel, in_ch, self.features),
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias",
                torch_bias_init_for(self.kernel * self.kernel * in_ch),
                (self.features,),
            )
            y = y + bias.astype(self.dtype)
        return y


def _convt2x_dilated(x, kernel):
    """The lhs-dilated lowering of ConvTranspose2d(k3, s2, p1, op1)."""
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding=((1, 2), (1, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _convt2x_phases(x, kernel):
    """The same operator as four stride-1 phase convs + 2x2 interleave
    (derivation in engine/attic.py phase_conv_transpose_2x):
      y[2t]   = x_t * K[1]            (even phase)
      y[2t+1] = x_t * K[0] + x_{t+1} * K[2]   (odd phase)
    Mathematically identical to _convt2x_dilated (equivalence-tested)."""
    B, H, W, C = x.shape
    O = kernel.shape[-1]
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(inp, ker, pad):
        return jax.lax.conv_general_dilated(inp, ker, (1, 1), padding=pad,
                                            dimension_numbers=dn)

    k = kernel
    p_ee = conv(x, k[1:2, 1:2], ((0, 0), (0, 0)))
    p_eo = conv(x, k[1:2, 0:3:2], ((0, 0), (0, 1)))
    p_oe = conv(x, k[0:3:2, 1:2], ((0, 1), (0, 0)))
    p_oo = conv(x, k[0:3:2, 0:3:2], ((0, 1), (0, 1)))
    phases = jnp.stack([p_ee, p_eo, p_oe, p_oo], axis=3)  # (B,H,W,4,O)
    y = phases.reshape(B, H, W, 2, 2, O)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, O)
    return y


@jax.custom_vjp
def conv_transpose_2x_op(x, kernel):
    return _convt2x_dilated(x, kernel)


def _convt2x_fwd(x, kernel):
    return _convt2x_dilated(x, kernel), (x, kernel)


def _convt2x_bwd(res, dy):
    # Differentiate through the PHASE decomposition: its VJP is built from
    # plain stride-1 convs with tiny kernels.  XLA CPU lowers the dilated
    # form's kernel-gradient to a naive window-dilated loop (~3 s per call
    # at 64x64x128 — 50x the whole rest of the step), which made CPU
    # training/tests pathologically slow; TPU keeps the dilated forward.
    x, kernel = res
    _, vjp = jax.vjp(_convt2x_phases, x, kernel)
    return vjp(dy)


conv_transpose_2x_op.defvjp(_convt2x_fwd, _convt2x_bwd)


class ConvTranspose2x(nn.Module):
    """ConvTranspose2d(k=3, s=2, p=1, output_padding=1): exact 2x upsample
    (reference conv2_tran, ops.py:45-54; used at models.py:72-75).

    Implemented as an input-dilated conv: lhs_dilation=2 with asymmetric
    padding (1, 2), which XLA maps onto the MXU directly.  The backward
    pass uses a custom VJP through the equivalent phase decomposition
    (see conv_transpose_2x_op).  Kernel is stored HWIO in the *forward
    conv* orientation; the torch-checkpoint converter
    (tools/convert_torch_ckpt.py) performs the spatial flip + I/O
    transpose.
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", torch_conv_kernel_init, (3, 3, in_ch, self.features)
        )
        y = conv_transpose_2x_op(
            x.astype(self.dtype), kernel.astype(self.dtype)
        )
        if self.use_bias:
            bias = self.param("bias", torch_bias_init_for(9 * in_ch), (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class BatchNorm(nn.Module):
    """BatchNorm2d(eps=1e-3) over NHWC channels (reference ops.py:75-77).

    torch momentum 0.1 (new = 0.9*running + 0.1*batch) == flax momentum 0.9.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-3,
            dtype=self.dtype,
        )(x)


class Dense(nn.Module):
    """Linear with xavier_uniform weight init (reference denselayer,
    ops.py:85-88; torch-default uniform bias)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.xavier_uniform(), (in_f, self.features)
        )
        b = self.param("bias", torch_bias_init_for(in_f), (self.features,))
        return x.astype(self.dtype) @ w.astype(self.dtype) + b.astype(self.dtype)


def lrelu(x, alpha: float = 0.2):
    """LeakyReLU(0.2) (reference ops.py:71-72)."""
    return nn.leaky_relu(x, negative_slope=alpha)


class ResidualBlock(nn.Module):
    """conv-ReLU-conv(no bias) (reference residual_block, models.py:54-58).

    NOTE: the skip-add is applied by the *caller* (generator adds it,
    models.py:81-82; the generator's upsample trunk uses this block WITHOUT
    a skip, models.py:72-75) — mirroring the reference structure.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = Conv(self.features, 3, 1, use_bias=True, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = Conv(self.features, 3, 1, use_bias=False, dtype=self.dtype)(y)
        return y
