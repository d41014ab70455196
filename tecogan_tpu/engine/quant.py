"""int8 (W8A8) quantized inference tail for the generator.

The recurrent 1080p pipeline spends ~11.6 ms/frame in the generator
tail's convs (DESIGN.md stage budget).  On v5e the int8 MXU path is 2x
the bf16 FLOP rate (394 vs 197 T/s) and int8 activations halve the HBM
bytes of the 1080p-scale feature maps — both of which the bf16 tail is
bound by.  This module provides an opt-in quantized tail for serving:

* **Weights**: symmetric per-output-channel int8
  (``s_w[o] = max|w[..., o]| / 127``), quantized once at load time.
* **Activations**: symmetric per-tensor int8 with *static* scales
  calibrated from a short clip prefix (``calibrate`` captures
  ``max|x|`` at every conv input through the real recurrence), so the
  hot loop does no runtime range reduction.
* Convs run as s8 x s8 -> s32 ``conv_general_dilated``
  (``preferred_element_type=int32``) — exact integer arithmetic on the
  MXU — followed by a fused dequant-scale + bias epilogue on the VPU.
* The first layer (conv_in / fused first layer) and conv_out stay in
  bf16: they touch the 3-channel image directly and cost little.
* Residual skip-adds stay in the compute dtype (error does not
  accumulate through the 16-block trunk).

The reference has no quantized path (torch fp16 AMP only,
reference main.py:239-252); this is TPU-native serving headroom, opt-in
via ``--quantize int8`` and OFF for parity/training.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")


def _conv_layers(params_g) -> Dict[str, dict]:
    """Tail conv layers in execution order: name -> {kernel, bias|None,
    dilated} (generator.tail_features topology, models/generator.py)."""
    layers = {}
    n = len([k for k in params_g if k.startswith("resblock_")])
    for i in range(n):
        p = params_g[f"resblock_{i}"]
        layers[f"resblock_{i}/Conv_0"] = dict(
            kernel=p["Conv_0"]["kernel"], bias=p["Conv_0"]["bias"],
            dilated=False)
        layers[f"resblock_{i}/Conv_1"] = dict(
            kernel=p["Conv_1"]["kernel"], bias=None, dilated=False)
    layers["up1"] = dict(kernel=params_g["up1"]["kernel"],
                         bias=params_g["up1"]["bias"], dilated=True)
    for nm in ("trunk_rb1", "trunk_rb2"):
        p = params_g[nm]
        layers[f"{nm}/Conv_0"] = dict(kernel=p["Conv_0"]["kernel"],
                                      bias=p["Conv_0"]["bias"], dilated=False)
        layers[f"{nm}/Conv_1"] = dict(kernel=p["Conv_1"]["kernel"],
                                      bias=None, dilated=False)
    layers["up2"] = dict(kernel=params_g["up2"]["kernel"],
                         bias=params_g["up2"]["bias"], dilated=True)
    layers["conv_hr"] = dict(kernel=params_g["conv_hr"]["kernel"],
                             bias=params_g["conv_hr"]["bias"], dilated=False)
    return layers


def _chain(params_g, net, conv):
    """tail_features control flow with a pluggable conv
    (models/generator.py tail_features; reference models.py:70-75)."""
    n = len([k for k in params_g if k.startswith("resblock_")])
    for i in range(n):
        y = jax.nn.relu(conv(net, f"resblock_{i}/Conv_0"))
        y = conv(y, f"resblock_{i}/Conv_1")
        net = y + net
    net = jax.nn.relu(conv(net, "up1"))
    for nm in ("trunk_rb1", "trunk_rb2"):
        net = jax.nn.relu(conv(net, f"{nm}/Conv_0"))
        net = conv(net, f"{nm}/Conv_1")
    net = jax.nn.relu(conv(net, "up2"))
    return jax.nn.relu(conv(net, "conv_hr"))


def _fconv(x, kernel, bias, dilated, dtype):
    k = kernel.astype(dtype)
    if dilated:
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), k, (1, 1), padding=((1, 2), (1, 2)),
            lhs_dilation=(2, 2), dimension_numbers=_DN)
    else:
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), k, (1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=_DN)
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def calibrate(params_g, net, dtype=jnp.float32):
    """Run the float tail on one first-layer activation ``net`` and
    return (features, {layer: max|conv input|}).  jit-friendly — fold
    maxima over frames with jnp.maximum at the call site."""
    layers = _conv_layers(params_g)
    maxes = {}

    def conv(x, name):
        l = layers[name]
        m = jnp.max(jnp.abs(x)).astype(jnp.float32)
        maxes[name] = jnp.maximum(maxes[name], m) if name in maxes else m
        return _fconv(x, l["kernel"], l["bias"], l["dilated"], dtype)

    feat = _chain(params_g, net, conv)
    return feat, maxes


def quantize_tail(params_g, act_maxes):
    """Build the quantized-tail pytree: per layer
    {wq s8 HWIO, inv_s f32 scalar, deq f32 per-out-channel, bias|None}.
    Scale/bias tables are f32; tail_features_int8 owns the compute dtype.

    inv_s = 127 / act_max (activation quant multiplier);
    deq = (act_max / 127) * (max|w[..,o]| / 127) (s32 -> float factor).
    """
    q = {}
    for name, l in _conv_layers(params_g).items():
        w = jnp.asarray(l["kernel"], jnp.float32)
        ws = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
        wq = jnp.round(w / ws).astype(jnp.int8)
        m = jnp.maximum(jnp.asarray(act_maxes[name], jnp.float32), 1e-12)
        q[name] = dict(
            wq=wq,
            inv_s=(127.0 / m).astype(jnp.float32),
            deq=(m / 127.0 * ws).astype(jnp.float32),
            bias=None if l["bias"] is None
            else jnp.asarray(l["bias"], jnp.float32),
        )
    return q


def tail_features_int8(params_g, qtail, net, compute_dtype=jnp.bfloat16):
    """Quantized tail_features: (B, H, W, 64) first-layer activations ->
    (B, 4H, 4W, 64) conv_hr features in compute_dtype.

    Layer metadata (which convs are lhs-dilated) is derived from the
    params structure, NOT stored in the qtail pytree — pytree leaves
    become tracers under jit."""
    meta = _conv_layers(params_g)

    def conv(x, name):
        l = qtail[name]
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) * l["inv_s"]), -127.0, 127.0
        ).astype(jnp.int8)
        if meta[name]["dilated"]:
            y = jax.lax.conv_general_dilated(
                xq, l["wq"], (1, 1), padding=((1, 2), (1, 2)),
                lhs_dilation=(2, 2), dimension_numbers=_DN,
                preferred_element_type=jnp.int32)
        else:
            y = jax.lax.conv_general_dilated(
                xq, l["wq"], (1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=_DN, preferred_element_type=jnp.int32)
        yf = y.astype(jnp.float32) * l["deq"]
        if l["bias"] is not None:
            yf = yf + l["bias"]
        return yf.astype(compute_dtype)

    return _chain(params_g, net, conv)


def calibrate_clip(cfg, params_g, lr_clip, frames: int = 8):
    """Static activation ranges from a clip prefix, through the REAL
    fast-path recurrence (warp feedback included): returns
    {layer: max|conv input|} folded over ``frames`` frames.

    Uses the s2d-carry fused path's first layer (the quantized tail is a
    serving feature of that path)."""
    import dataclasses

    from .state import model_defs
    from . import fused as F

    gen, _ = model_defs(cfg)
    gen = dataclasses.replace(gen, out_dtype=jnp.bfloat16)
    variables = {"params": params_g}
    k_out = params_g["conv_out"]["kernel"]
    b_out = params_g["conv_out"]["bias"]

    @jax.jit
    def first(lr0):
        k = params_g["conv_in"]["kernel"][:, :, :3]
        b = params_g["conv_in"]["bias"]
        dt = gen.dtype
        y = jax.lax.conv_general_dilated(
            lr0.astype(dt), k.astype(dt), (1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=_DN)
        net = jax.nn.relu(y + b.astype(dt))
        feat, maxes = calibrate(params_g, net, dtype=gen.dtype)
        return F.conv_out_s2d(feat, k_out, b_out), maxes

    @jax.jit
    def step(carry, prev_lr, cur_lr):
        ix, iy = F.planar_pseudo_flow_coords(prev_lr)
        warped = F.warp_s2d_carry(carry, ix, iy,
                                  unroll_streams=cfg.gather_unroll_streams)
        net = F.fused_first_layer(params_g, cur_lr, warped, dtype=gen.dtype)
        feat, maxes = calibrate(params_g, net, dtype=gen.dtype)
        return F.conv_out_s2d(feat, k_out, b_out), maxes

    lr_clip = jnp.asarray(lr_clip)
    T = min(int(frames), lr_clip.shape[1])
    carry, maxes = first(lr_clip[:, 0])
    for t in range(1, T):
        carry, m = step(carry, lr_clip[:, t - 1], lr_clip[:, t])
        maxes = jax.tree_util.tree_map(jnp.maximum, maxes, m)
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), maxes)
