"""The jitted TecoGAN train step.

One compiled XLA program replaces the reference's eager per-batch flow
(main.py:270-275 -> code/train.py:374-377 -> TecoGAN): generator unroll,
triplet assembly, both losses, and both Adam updates — no host round-trips.
Two optimizers share a single generator forward: the G gradient comes from
``value_and_grad`` over the full objective; the D gradient re-runs only the
(small) discriminator on the stop-gradient'ed triplet inputs carried in aux.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..config import TecoConfig
from ..ops.image import transfer_dequantize_f32
from .losses import tecogan_losses, discriminator_loss
from .state import TrainState, make_optimizers, model_defs


_STEP_CACHE: dict = {}


def _cfg_key(cfg: TecoConfig):
    import dataclasses as _dc

    return tuple(getattr(cfg, f.name) for f in _dc.fields(cfg))


def build_train_step(cfg: TecoConfig, vgg_apply=None, donate: bool = True):
    """Returns ``train_step(state, lr_batch, hr_batch) -> (state, metrics)``.

    lr_batch: (B, T, 3, H, W), hr_batch: (B, T, 3, 4H, 4W), both f32 [0,1]
    (the reference's loader emits exactly these: main.py:270-272).

    Steps are memoized per (cfg, vgg, donate) so repeated builders share
    one compiled program (jit caches by function identity).
    """
    cache_key = (_cfg_key(cfg), id(vgg_apply) if vgg_apply else None, donate)
    if cache_key in _STEP_CACHE:
        return _STEP_CACHE[cache_key]
    step = _build_train_step(cfg, vgg_apply, donate)
    _STEP_CACHE[cache_key] = step
    return step


def _build_train_step(cfg: TecoConfig, vgg_apply=None, donate: bool = True):
    gen, disc = model_defs(cfg)
    opt_g_tx, opt_d_tx, sched = make_optimizers(cfg)

    def train_step(state: TrainState, lr_batch, hr_batch):
        # uint8 batches deprocess ON DEVICE (--transfer_dtype u8): 4x
        # fewer H2D bytes over a remote-TPU link, and 4x less host
        # memory lost to the axon client's per-transfer leak (DESIGN.md
        # "Host-memory leak in the remote-TPU client").  jit specializes
        # on input dtype, so f32 callers compile the exact same program
        # as before.
        # the u8<->f32 round-trip contract lives in ops/image.py
        # (transfer_quantize_u8 / transfer_dequantize_f32)
        if lr_batch.dtype == jnp.uint8:
            lr_batch = transfer_dequantize_f32(lr_batch)
        if hr_batch.dtype == jnp.uint8:
            hr_batch = transfer_dequantize_f32(hr_batch)
        lr_now = sched(state.epoch)

        def gen_objective(params_g):
            return tecogan_losses(
                gen, disc, params_g, state.params_d, state.batch_stats_d,
                lr_batch, hr_batch, state.step, cfg, vgg_apply,
            )

        (gen_loss, aux), grads_g = jax.value_and_grad(
            gen_objective, has_aux=True
        )(state.params_g)

        def disc_objective(params_d):
            return discriminator_loss(
                disc, params_d, state.batch_stats_d,
                aux["real_in"], aux["fake_in"], cfg,
            )

        (d_loss, new_stats), grads_d = jax.value_and_grad(
            disc_objective, has_aux=True
        )(state.params_d)

        # Adam updates at the current StepLR rate (main.py:239-248,296-297).
        opt_g_state = state.opt_g
        opt_g_state.hyperparams["learning_rate"] = lr_now
        updates_g, opt_g_state = opt_g_tx.update(grads_g, opt_g_state, state.params_g)
        params_g = optax.apply_updates(state.params_g, updates_g)

        d_scale = 1.0 if cfg.Dt_mergeDs else 0.3
        opt_d_state = state.opt_d
        opt_d_state.hyperparams["learning_rate"] = lr_now * d_scale
        updates_d, opt_d_state = opt_d_tx.update(grads_d, opt_d_state, state.params_d)

        # D-balance gating: the reference parses --Dbalance and threads
        # counter1/counter2 but never gates anything (main.py:123,
        # train.py:350-351 — SURVEY §5.1.5).  Intended behavior (active in
        # fixed mode): t_balance = mean(log(D_real)) + mean(-log(D_fake))
        # grows large and POSITIVE as D wins (D_real→1, D_fake→0), so skip
        # the D update when the balance EMA exceeds the threshold.
        tb = aux["metrics"]["t_balance"]
        if cfg.bug_parity:
            apply_d = jnp.array(True)
        else:
            apply_d = tb < cfg.Dbalance
        updates_d = jax.tree.map(
            lambda u: jnp.where(apply_d, u, jnp.zeros_like(u)), updates_d
        )
        params_d = optax.apply_updates(state.params_d, updates_d)

        metrics = dict(aux["metrics"])
        metrics["learning_rate"] = lr_now
        metrics["d_loss"] = d_loss
        metrics["gen_loss"] = gen_loss
        # the reference's counter1/counter2 slots (update_list_name
        # "withD_counter"/"w_o_D_counter", train.py:350-351) — now real
        metrics["withD_counter"] = apply_d.astype(jnp.float32)
        metrics["w_o_D_counter"] = 1.0 - apply_d.astype(jnp.float32)

        new_state = TrainState(
            params_g=params_g,
            params_d=params_d,
            batch_stats_d=new_stats,
            opt_g=opt_g_state,
            opt_d=opt_d_state,
            step=state.step + 1,
            epoch=state.epoch,
        )
        return new_state, metrics, aux["gen_outputs"]

    if cfg.jit:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())
    return train_step


def build_multi_train_step(cfg: TecoConfig, vgg_apply=None, donate: bool = True):
    """K train steps per dispatch as one ``lax.scan``-compiled program
    (K = cfg.steps_per_dispatch).

    Intended to amortize per-dispatch host latency on slow links.
    MEASURED SLOWER on the v5e remote-TPU setup (clean A/B, reference
    config: K=1 145 ms/step vs K=8 ~570 ms/step): JAX's async dispatch
    already pipelines the per-step Python loop, while the scan's
    while-loop carry double-buffers the full optimizer state each
    iteration (donation doesn't reach inside the loop).  ``unroll=K``
    fixes the copies but its compile time explodes (8 inlined train
    steps never finished in 9 min).  Keep steps_per_dispatch=1 unless a
    profile of YOUR link says otherwise; the feature stays because it is
    numerically verified (tests/test_train.py) and the trade-off is
    environment-dependent.

    ``multi_step(state, lr_k, hr_k) -> (state, metrics, last_gen_out)``
    with lr_k (K, B, T, 3, H, W) / hr_k (K, B, T, 3, 4H, 4W); every metric
    comes back stacked with leading dim K (metrics[...][k] is step k).
    """
    k = int(cfg.steps_per_dispatch)
    if k <= 1:
        raise ValueError("build_multi_train_step requires steps_per_dispatch > 1")
    base = _build_train_step(cfg.replace(jit=False), vgg_apply, donate=False)

    def multi_step(state: TrainState, lr_k, hr_k):
        def body(st, xs):
            lr_b, hr_b = xs
            st, metrics, gen_out = base(st, lr_b, hr_b)
            return st, (metrics, gen_out)

        state, (metrics_k, gen_outs) = jax.lax.scan(body, state, (lr_k, hr_k))
        return state, metrics_k, gen_outs[-1]

    if cfg.jit:
        return jax.jit(multi_step, donate_argnums=(0,) if donate else ())
    return multi_step


def set_epoch(state: TrainState, epoch: int) -> TrainState:
    return state.replace(epoch=jnp.asarray(epoch, jnp.int32))
