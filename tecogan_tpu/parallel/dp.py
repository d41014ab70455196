"""Data-parallel training wiring.

One jitted SPMD program: the batch is sharded over the ``data`` mesh axis,
the train state is replicated, and XLA inserts the gradient all-reduce over
ICI (the only collective this workload needs for parity — SURVEY.md §2.2).
The loss means in ``engine/losses.py`` are global means, so the partitioner
lowers them to ``psum``-based cross-replica reductions automatically.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

from ..config import TecoConfig
from ..engine.train import build_train_step
from .mesh import batch_sharding, replicated


def build_dp_train_step(cfg: TecoConfig, mesh: Mesh, vgg_apply=None, donate=True):
    """Jitted data-parallel train step with explicit shardings.

    Usage:
      state = replicate_state(mesh, init_state(cfg, rng))
      lr, hr = shard_batch(mesh, lr_np, hr_np)
      state, metrics, _ = dp_step(state, lr, hr)
    """
    base_cfg = cfg.replace(jit=False)
    step_fn = build_train_step(base_cfg, vgg_apply=vgg_apply, donate=False)

    repl = replicated(mesh)
    batched = batch_sharding(mesh)

    return jax.jit(
        step_fn,
        in_shardings=(repl, batched, batched),
        out_shardings=(repl, repl, batched),
        donate_argnums=(0,) if donate else (),
    )


def build_dp_multi_train_step(cfg: TecoConfig, mesh: Mesh, vgg_apply=None,
                              donate=True):
    """Data-parallel K-steps-per-dispatch program: scan over
    cfg.steps_per_dispatch stacked batches, each sharded over ``data``
    on dim 1 (see engine.train.build_multi_train_step)."""
    from ..engine.train import build_multi_train_step
    from .mesh import multi_batch_sharding

    base_cfg = cfg.replace(jit=False)
    multi = build_multi_train_step(base_cfg, vgg_apply=vgg_apply, donate=False)

    repl = replicated(mesh)
    kb = multi_batch_sharding(mesh)

    return jax.jit(
        multi,
        in_shardings=(repl, kb, kb),
        out_shardings=(repl, repl, batch_sharding(mesh)),
        donate_argnums=(0,) if donate else (),
    )


def build_dp_quantized_inference(cfg: TecoConfig, mesh: Mesh):
    """Data-parallel int8 (W8A8) serving: returns ``(prepare, infer)``
    like engine.inference.build_quantized_clip_inference, with clips
    sharded over ``data`` and params + qtail replicated.  ``prepare``
    stays a single-device call (calibration is a one-off over a few
    frames); pass its result straight to ``infer`` — the in_sharding
    replicates it like the params."""
    from ..engine.inference import build_quantized_clip_inference

    base_cfg = cfg.replace(jit=False, gather_unroll_streams=False)
    prepare, infer = build_quantized_clip_inference(base_cfg)
    repl = replicated(mesh)
    return prepare, jax.jit(
        infer,
        in_shardings=(repl, repl, batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh),
    )


def build_dp_inference(cfg: TecoConfig, mesh: Mesh):
    """Data-parallel clip inference: scenes sharded over the data axis.

    gather_unroll_streams is forced off: the mesh-sharded batch axis means
    each shard already runs the fast B=1 warp-gather graph, while the
    single-chip per-stream unroll (table[b] slices) would reference all
    streams from every device and force cross-device movement."""
    from ..engine.inference import build_clip_inference

    base_cfg = cfg.replace(jit=False, gather_unroll_streams=False)
    infer = build_clip_inference(base_cfg)
    return jax.jit(
        infer,
        in_shardings=(replicated(mesh), batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh),
    )
