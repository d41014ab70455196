"""FNet-based training variant (flag-gated capability).

The reference ships FNet but leaves every call site commented out
(main.py:231,244-245,249,259-261,278; code/train.py:343-346 — SURVEY.md
component 11) and substitutes the pseudo-flow.  This module implements the
*original TecoGAN/FRVSR* recurrence those dead call sites sketch: FNet
estimates LR flow from (prev, cur) frame pairs, the flow is bilinearly
upscaled 4x (values scaled 4x) into a displacement field, the previous SR
output is warped by it, and FNet trains on the LR warp loss + shares the
content/adversarial objective (the fnet_loss the reference computes and
discards, train.py:244,343-346).

Select with cfg via ``use_fnet=True`` (TecoConfig extension) in
build_fnet_train_step; the discriminator/loss machinery is reused from
engine/losses.py with the flow source swapped.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import TecoConfig
from ..models import FNet
from ..ops.image import nchw_to_nhwc, nhwc_to_nchw, deprocess
from ..ops.resize import upscale_four
from ..ops.space import space_to_depth_nchw
from ..ops.warp import grid_sample_nchw
from .losses import _mean_sum_w
from .state import model_defs, make_optimizers


def flow_to_grid(flow_hr: jnp.ndarray) -> jnp.ndarray:
    """Displacement field (B, 2, H, W) in pixels -> absolute normalized
    sampling grid (B, H, W, 2) with torch grid_sample conventions."""
    B, _, H, W = flow_hr.shape
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    gx = (xs[None, :] + flow_hr[:, 0].reshape(B, H, W))
    gy = (ys[:, None] + flow_hr[:, 1].reshape(B, H, W))
    # pixel coords -> align_corners=False normalized coords
    gx = (2.0 * gx + 1.0) / W - 1.0
    gy = (2.0 * gy + 1.0) / H - 1.0
    return jnp.stack([gx, gy], axis=-1)


def fnet_flow(fnet, params_f, prev_lr_nchw, cur_lr_nchw):
    """LR flow from a frame pair, upscaled to HR displacement
    (models.py:22-50 topology; FRVSR Sec. 3 recurrence)."""
    pair = jnp.concatenate([prev_lr_nchw, cur_lr_nchw], axis=1)
    flow_lr = fnet.apply({"params": params_f}, nchw_to_nhwc(pair))  # (B,H,W,2)
    flow_lr = nhwc_to_nchw(flow_lr)
    return upscale_four(flow_lr * 4.0, layout="NCHW")  # (B, 2, 4H, 4W)


class FnetUnroll(NamedTuple):
    gen_outputs: jnp.ndarray
    warp_loss: jnp.ndarray


def fnet_generator_unroll(gen, fnet, params_g, params_f, r_inputs, cfg: TecoConfig):
    """FRVSR recurrence with learned flow: per frame, warp prev SR by the
    FNet flow, space-to-depth, concat, generate."""
    B, T, C, H, W = r_inputs.shape

    def apply_gen(inp_nchw):
        out = gen.apply({"params": params_g}, nchw_to_nhwc(inp_nchw))
        return nhwc_to_nchw(out)

    input0 = jnp.concatenate(
        [r_inputs[:, 0], jnp.zeros((B, 48, H, W), r_inputs.dtype)], axis=1
    )
    sr0 = apply_gen(input0)

    pairs = (jnp.moveaxis(r_inputs[:, :-1], 1, 0), jnp.moveaxis(r_inputs[:, 1:], 1, 0))

    warp_losses = []

    def step(prev_sr, xs):
        prev_lr, cur_lr = xs
        flow_hr = fnet_flow(fnet, params_f, prev_lr, cur_lr)
        grid = flow_to_grid(flow_hr)
        warped = grid_sample_nchw(prev_sr, grid)
        feedback = space_to_depth_nchw(deprocess(warped))
        inp = jnp.concatenate([cur_lr, feedback], axis=1)
        sr = apply_gen(inp)

        # LR warp loss drives FNet (FRVSR objective; the reference's
        # fnet_loss shell at train.py:244-251,343-346)
        lr_grid = flow_to_grid(flow_hr[:, :, ::4, ::4] / 4.0)
        prev_warp_lr = grid_sample_nchw(prev_lr, lr_grid)
        wl = _mean_sum_w(jnp.square(cur_lr - prev_warp_lr))
        return sr, (sr, wl)

    _, (sr_rest, wls) = jax.lax.scan(step, sr0, pairs)
    gen_outputs = jnp.concatenate([sr0[:, None], jnp.moveaxis(sr_rest, 0, 1)], axis=1)
    return FnetUnroll(gen_outputs, jnp.mean(wls))


def build_fnet_train_step(cfg: TecoConfig):
    """Jitted generator+FNet step (content L2 + warp loss), the
    FRVSR-pretrain config of BASELINE.json (config 3)."""
    gen, _ = model_defs(cfg)
    fnet = FNet(dtype=jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32)
    opt_g_tx, opt_f_tx, sched = make_optimizers(cfg)

    def init(rng):
        rg, rf = jax.random.split(rng)
        h = cfg.crop_size
        params_g = gen.init(rg, jnp.zeros((1, h, h, 51), jnp.float32))["params"]
        params_f = fnet.init(rf, jnp.zeros((1, h, h, 6), jnp.float32))["params"]
        return {
            "params_g": params_g,
            "params_f": params_f,
            "opt_g": opt_g_tx.init(params_g),
            "opt_f": opt_f_tx.init(params_f),
            "step": jnp.zeros((), jnp.int32),
            "epoch": jnp.zeros((), jnp.int32),
        }

    def train_step(state, lr_batch, hr_batch):
        lr_now = sched(state["epoch"])

        def loss_fn(params):
            params_g, params_f = params
            unroll = fnet_generator_unroll(
                gen, fnet, params_g, params_f, lr_batch, cfg
            )
            B, T = lr_batch.shape[:2]
            H4 = lr_batch.shape[3] * 4
            s_gen = unroll.gen_outputs.reshape(B * T, 3, H4, -1)
            s_tgt = hr_batch.reshape(B * T, 3, H4, -1)
            content = _mean_sum_w(jnp.square(s_gen - s_tgt))
            loss = content + cfg.warp_scaling * unroll.warp_loss
            return loss, {"l2_content_loss": content,
                          "l2_warp_loss": unroll.warp_loss,
                          "gen_loss": loss}

        (loss, metrics), (g_g, g_f) = jax.value_and_grad(loss_fn, has_aux=True)(
            (state["params_g"], state["params_f"])
        )
        state["opt_g"].hyperparams["learning_rate"] = lr_now
        state["opt_f"].hyperparams["learning_rate"] = lr_now
        up_g, opt_g = opt_g_tx.update(g_g, state["opt_g"], state["params_g"])
        up_f, opt_f = opt_f_tx.update(g_f, state["opt_f"], state["params_f"])
        new_state = {
            "params_g": optax.apply_updates(state["params_g"], up_g),
            "params_f": optax.apply_updates(state["params_f"], up_f),
            "opt_g": opt_g,
            "opt_f": opt_f,
            "step": state["step"] + 1,
            "epoch": state["epoch"],
        }
        metrics["learning_rate"] = lr_now
        return new_state, metrics

    return init, (jax.jit(train_step) if cfg.jit else train_step)
