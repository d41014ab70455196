"""Training state pytrees and optimizer construction.

Optimizers mirror the reference (main.py:236-248): Adam(lr=1e-4,
betas=(beta, 0.999), eps=adameps) for both G and D, D lr x0.3 when
Dt_mergeDs is off, and StepLR(decay_step, decay_rate) stepped once per
*epoch* (main.py:296-297).  On TPU there is no GradScaler — bf16 compute
with f32 params/optimizer state replaces CUDA AMP (SURVEY.md §2.2 mixed
precision row).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import TecoConfig
from ..models import Generator, Discriminator


@struct.dataclass
class TrainState:
    params_g: Any
    params_d: Any
    batch_stats_d: Any
    opt_g: Any
    opt_d: Any
    step: jnp.ndarray  # global step (int32)
    epoch: jnp.ndarray  # current epoch, drives the StepLR schedule


def lr_schedule(cfg: TecoConfig):
    """StepLR: lr * decay_rate ** (epoch // decay_step), staircase — exactly
    torch.optim.lr_scheduler.StepLR stepped per epoch (main.py:247-248,296)."""

    def schedule(epoch):
        return cfg.learning_rate * jnp.power(
            cfg.decay_rate, jnp.floor_divide(epoch, cfg.decay_step).astype(jnp.float32)
        )

    return schedule


def make_optimizers(cfg: TecoConfig):
    sched = lr_schedule(cfg)

    def adam(lr_scale: float):
        return optax.inject_hyperparams(
            lambda learning_rate: optax.adam(
                learning_rate, b1=cfg.beta, b2=0.999, eps=cfg.adameps
            )
        )(learning_rate=cfg.learning_rate * lr_scale)

    d_scale = 1.0 if cfg.Dt_mergeDs else 0.3  # main.py:237-238
    return adam(1.0), adam(d_scale), sched


def model_defs(cfg: TecoConfig):
    dtype = jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32
    gen = Generator(num_resblock=cfg.num_resblock, out_channels=3, dtype=dtype)
    disc = Discriminator(
        resblocks=cfg.discrim_resblocks, channels=cfg.discrim_channels, dtype=dtype
    )
    return gen, disc


def init_state(cfg: TecoConfig, rng: jax.Array) -> TrainState:
    from .losses import d_input_spec

    gen, disc = model_defs(cfg)
    rng_g, rng_d = jax.random.split(rng)
    h = cfg.crop_size
    params_g = gen.init(rng_g, jnp.zeros((1, h, h, 51), jnp.float32))["params"]
    # D input: 27ch merged triplets by default; 9ch cropped warped triplets
    # when Dt_mergeDs is off (losses.d_input_spec).
    d_ch, d_hw = d_input_spec(cfg)
    d_vars = disc.init(
        rng_d, jnp.zeros((1, d_hw, d_hw, d_ch), jnp.float32), train=True
    )
    opt_g_tx, opt_d_tx, _ = make_optimizers(cfg)
    return TrainState(
        params_g=params_g,
        params_d=d_vars["params"],
        batch_stats_d=d_vars.get("batch_stats", {}),
        opt_g=opt_g_tx.init(params_g),
        opt_d=opt_d_tx.init(d_vars["params"]),
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
    )
