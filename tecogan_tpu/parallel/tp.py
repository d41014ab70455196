"""Tensor (channel) parallelism over the ``model`` mesh axis.

The reference has no distributed code at all (SURVEY.md §2.2); round 1
reserved a ``model`` axis in the mesh API because the ~11M-param models
don't *need* TP for parity.  This module makes the axis functional: conv
kernels are sharded over their output-channel dim, optimizer moments
follow their parameters, and XLA's SPMD partitioner propagates the
shardings through the train step — inserting the (all-gather /
reduce-scatter) collectives over ICI where the recurrent convs consume
channel-sharded weights.

Numerics are unchanged (verified vs the single-device step in
tests/test_dist.py): sharding a weight never changes the math, only its
placement, and the loss means stay global.

Usage:
    mesh = make_mesh(n_data=4, n_model=2)
    state = shard_state_tp(mesh, init_state(cfg, rng))   # DP x TP
    step = build_tp_train_step(cfg, mesh)                # jit, inferred shardings
    lr, hr = shard_batch(mesh, lr, hr)
    state, metrics, gen_out = step(state, lr, hr)
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TecoConfig
from ..engine.train import build_train_step
from .mesh import MODEL_AXIS, batch_sharding


def _array_sharding(mesh: Mesh, x) -> NamedSharding:
    """Sharding rule for one state leaf: shard the trailing
    (output-channel) dim of conv kernels over ``model`` when it divides
    evenly; replicate everything else (biases, BN stats, scalars)."""
    n_model = mesh.shape[MODEL_AXIS]
    if (
        n_model > 1
        and getattr(x, "ndim", 0) == 4
        and x.shape[-1] % n_model == 0
        and x.shape[-1] >= 2 * n_model
    ):
        return NamedSharding(mesh, P(None, None, None, MODEL_AXIS))
    return NamedSharding(mesh, P())


def state_shardings(mesh: Mesh, state):
    """Sharding pytree for a TrainState: conv kernels (and their Adam
    moments, which have identical shapes) channel-sharded, rest
    replicated."""
    return jax.tree.map(lambda x: _array_sharding(mesh, x), state)


def shard_state_tp(mesh: Mesh, state):
    """Place a TrainState on the mesh with channel-sharded conv kernels."""
    return jax.device_put(state, state_shardings(mesh, state))


def build_tp_train_step(cfg: TecoConfig, mesh: Mesh, vgg_apply=None,
                        donate=True):
    """Jitted train step for a (data, model) mesh with channel-sharded
    params.  Shardings are INFERRED from the committed input placements
    (shard_state_tp / shard_batch) and propagated by the SPMD
    partitioner; outputs keep the input param shardings."""
    base_cfg = cfg.replace(jit=False)
    step_fn = build_train_step(base_cfg, vgg_apply=vgg_apply, donate=False)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
