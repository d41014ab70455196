"""TecoGAN loss engine — the reference's whole train-step math
(/root/reference/code/train.py:49-348) rebuilt as pure JAX functions.

Layout convention: this module's *interfaces* use the reference's logical
NCHW clip shapes ``(B, T, 3, H, W)`` so the raw ``view``/``reshape``
re-interpretations that the reference relies on (SURVEY.md §5.1.1/7) are
bit-comparable via ``jnp.reshape`` (C-order, same as torch ``.view`` on
contiguous tensors).  Models run NHWC internally; transposes at the model
boundary are fused by XLA.

``cfg.bug_parity`` selects reference-exact behavior:
  * generator input detached every frame (train.py:90,108) — no BPTT;
  * adversarial + feature-matching losses detached on the G side
    (train.py:288,219) — G effectively trains on content L2 alone;
  * fp16 rounding of the warp grids (train.py:98,187);
  * the per-step-reinstantiated EMA (train.py:324-333): tb = 0.99*t_balance.
With ``bug_parity=False`` the *intended* TecoGAN formulation runs:
gradients flow through the recurrence and the adversarial/feature terms.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import TecoConfig
from ..ops.image import nchw_to_nhwc, nhwc_to_nchw, preprocess, deprocess
from ..ops.resize import upscale_four
from ..ops.space import space_to_depth_nchw
from ..ops.warp import grid_sample_nchw

VGG_LAYER_LABELS = ("vgg_19/conv2_2", "vgg_19/conv3_4", "vgg_19/conv4_4")
D_LAYER_NORM = (12.0, 14.0, 24.0, 100.0)  # train.py:214
FIX_RANGE = 0.02  # train.py:206


class UnrollResult(NamedTuple):
    gen_outputs: jnp.ndarray  # (B, T, 3, 4H, 4W)
    gen_flow: jnp.ndarray     # (B, T-1, 2, 4H, 4W) pseudo-flow
    warp_loss: jnp.ndarray    # scalar LR self-warp metric (train.py:247-251)


def _mean_sum_w(x: jnp.ndarray) -> jnp.ndarray:
    """torch ``mean(sum(., dim=3))`` on NCHW — sum over width only
    (train.py:241,249; scale matters for LR schedules, SURVEY §5.1.8)."""
    return jnp.mean(jnp.sum(x, axis=3))


def pingpang_extend(clip: jnp.ndarray) -> jnp.ndarray:
    """Mirror-concat a (B, T, ...) clip to 2T-1 frames (train.py:56-62)."""
    rev = jnp.flip(clip, axis=1)[:, 1:]
    return jnp.concatenate([clip, rev], axis=1)


def pseudo_flow_sequence(r_inputs: jnp.ndarray, crop: Tuple[int, int]) -> jnp.ndarray:
    """All T-1 pseudo-flows: ``upscale_four(Frame_t_pre * 4)[:, 0:2]``
    reshaped to (B, T-1, 2, 4H, 4W) (train.py:71-77)."""
    B, T, C, H, W = r_inputs.shape
    frames_pre = r_inputs[:, :-1].reshape(B * (T - 1), C, H, W)
    up = upscale_four(frames_pre * 4.0, layout="NCHW")
    return up[:, 0:2].reshape(B, T - 1, 2, 4 * H, 4 * W)


def flows_to_grids(gen_flow: jnp.ndarray, parity_half: bool) -> jnp.ndarray:
    """Per-frame raw ``view(B, 4H, 4W, 2)`` of each (B, 2, 4H, 4W) slice
    (train.py:96) — a C-order reinterpretation, not a transpose."""
    B, Tm1, _, H4, W4 = gen_flow.shape
    grids = gen_flow.reshape(B, Tm1, H4, W4, 2)
    if parity_half:
        grids = grids.astype(jnp.float16).astype(jnp.float32)
    return grids


def _warp_nchw(image_nchw: jnp.ndarray, grid: jnp.ndarray,
               fast: bool) -> jnp.ndarray:
    """Bilinear warp used throughout the loss engine.

    fast=False (bug_parity): the reference-exact 4-gather sampler.
    fast=True: the single-gather patch-table sampler in f32 — identical
    math (maxdiff ~2e-7, pure float association), but its one wide gather
    and ONE scatter in the backward cut the training triplet assembly from
    ~37/99 ms (fwd/grad) to ~6/30 ms on v5e (12-byte 3-channel gather rows
    and 4 separate adjoint scatters were the cost)."""
    if not fast:
        return grid_sample_nchw(image_nchw, grid)
    from .fused import grid_sample_patch

    x = jnp.transpose(image_nchw, (0, 2, 3, 1))
    y = grid_sample_patch(x, grid, dtype=jnp.float32)
    return jnp.transpose(y, (0, 3, 1, 2))


def recurrent_feedback(prev_sr_nchw: jnp.ndarray, grid: jnp.ndarray,
                       fast: bool = False) -> jnp.ndarray:
    """Warp the previous SR output by the pseudo-flow grid and pack it
    space-to-depth into 48 LR channels (train.py:98-106).  This is the hot
    recurrent path that engine/fused.py accelerates for inference."""
    warped = _warp_nchw(prev_sr_nchw, grid, fast)
    # preprocessLr(deprocess(x)) == (x + 1) / 2 (ops.py:29-36, train.py:101)
    warped = deprocess(warped)
    return space_to_depth_nchw(warped)


def generator_unroll(
    gen, params_g, r_inputs: jnp.ndarray, cfg: TecoConfig
) -> UnrollResult:
    """Run the recurrent generator over the (possibly ping-pong-extended)
    clip with ``lax.scan`` (replaces the eager loop at train.py:94-111).

    r_inputs: (B, T, 3, H, W) in [0, 1].
    """
    B, T, C, H, W = r_inputs.shape

    gen_flow = pseudo_flow_sequence(r_inputs, (H, W))
    grids = flows_to_grids(gen_flow, parity_half=cfg.bug_parity)

    def apply_gen(inp_nchw):
        if cfg.bug_parity:
            # generator_F(inputs.detach()) — recurrence is NOT backpropped
            # through in the reference (train.py:90,108).
            inp_nchw = jax.lax.stop_gradient(inp_nchw)
        out = gen.apply({"params": params_g}, nchw_to_nhwc(inp_nchw))
        return nhwc_to_nchw(out)

    # Frame 0: LR frame + 48 zero feedback channels (train.py:86-92).
    input0 = jnp.concatenate(
        [r_inputs[:, 0], jnp.zeros((B, 48, H, W), r_inputs.dtype)], axis=1
    )
    sr0 = apply_gen(input0)

    frames_t = jnp.moveaxis(r_inputs[:, 1:], 1, 0)  # (T-1, B, 3, H, W)
    grids_t = jnp.moveaxis(grids, 1, 0)  # (T-1, B, 4H, 4W, 2)

    def step_fn(prev_sr, xs):
        frame, grid = xs
        feedback = recurrent_feedback(prev_sr, grid, fast=not cfg.bug_parity)
        inp = jnp.concatenate([frame, feedback], axis=1)
        sr = apply_gen(inp)
        return sr, sr

    step = jax.checkpoint(step_fn) if cfg.remat else step_fn
    # XLA CPU executes ops inside while-loop bodies without intra-op
    # parallelism/fast-path convs: the BACKWARD of this scan measured
    # ~190 s/step at reference shapes vs ~4 s fully unrolled (the forward
    # is unaffected).  TPU keeps the rolled loop — unrolling only bloats
    # its compile.  Trace-time backend check; both forms are identical math.
    unroll = True if jax.default_backend() == "cpu" else 1
    _, sr_rest = jax.lax.scan(step, sr0, (frames_t, grids_t), unroll=unroll)

    gen_outputs = jnp.concatenate(
        [sr0[:, None], jnp.moveaxis(sr_rest, 0, 1)], axis=1
    )  # (B, T, 3, 4H, 4W)

    # LR self-warp metric (train.py:81-84, 247-251): warp Frame_t_pre by the
    # raw-reshaped RG channels of Frame_t; logged only, never optimized.
    frames_pre_flat = r_inputs[:, :-1].reshape(B * (T - 1), C, H, W)
    frames_nxt = r_inputs[:, 1:]
    warp_grid = frames_nxt[:, :, 0:2].reshape(B * (T - 1), H, W, 2)
    s_input_warp = _warp_nchw(frames_pre_flat, warp_grid, fast=not cfg.bug_parity)
    input_frames = frames_nxt.reshape(B * (T - 1), C, H, W)
    warp_loss = _mean_sum_w(jnp.square(input_frames - s_input_warp))

    return UnrollResult(gen_outputs, gen_flow, warp_loss)


def d_input_spec(cfg: TecoConfig) -> Tuple[int, int]:
    """(channels, spatial size) of the discriminator input.

    Merged mode (default, train.py:172-179): 27 channels at 4*crop_size
    (crop_dt crops then zero-pads back).  Unmerged mode (the reference's
    ``Dt_mergeDs=False`` intent at train.py:183-184,196-199 — which crashes
    in the reference since its D hardcodes 27 input channels): the
    9-channel warped triplet alone, at the crop_dt-cropped size (the
    reference feeds the cropped tensor without padding back).
    """
    h4 = 4 * cfg.crop_size
    if cfg.Dt_mergeDs:
        return 27, h4
    if cfg.crop_dt < 1.0:
        c = int(h4 * cfg.crop_dt)
        off = (h4 - c) // 2
        return 9, h4 - 2 * off
    return 9, h4


def assemble_triplets(
    r_inputs: jnp.ndarray,
    r_targets: jnp.ndarray,
    gen_outputs: jnp.ndarray,
    gen_flow: jnp.ndarray,
    cfg: TecoConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build the real/fake discriminator inputs (train.py:129-199).

    Merged mode (Dt_mergeDs, default): 27-channel triplets of
    [before-warp, warped-by-T_vel, bilinear-upscaled LR], center-cropped by
    crop_dt and zero-padded back.  Unmerged mode: the 9-channel warped
    triplet alone at the cropped size (see d_input_spec).

    Returns (real_in, fake_in); fake_in carries gradients to the generator
    (detaching is the caller's choice).
    """
    B, T, C, H, W = r_inputs.shape
    H4, W4 = 4 * H, 4 * W
    t_size = 3 * (T // 3)
    n_trip = t_size // 3
    t_batch = B * n_trip

    t_gen = gen_outputs[:, :t_size].reshape(B * t_size, 3, H4, W4)
    t_tgt = r_targets[:, :t_size].reshape(B * t_size, 3, H4, W4)

    # --- velocity triplet T_vel (train.py:138-158) ----------------------
    v_pre = gen_flow[:, 0:t_size:3]  # (B, n_trip, 2, H4, W4)
    v_mid = jnp.zeros_like(v_pre)
    if cfg.pingpang:
        v_nxt = jnp.flip(gen_flow, axis=1)[:, 1:t_size:3]
    elif cfg.bug_parity:
        # Reference-exact "backward flow": raw-reshaped concat of frames
        # [2::3] and [1::3], first B rows only, upscaled (train.py:139-149).
        # The reshape at train.py:144-145 splits 2*C=6 channels into
        # (t_size//3, 2), so it only type-checks when t_size//3 == 3 —
        # i.e. RNN_N in {9, 10, 11}.  The reference crashes outside that
        # domain too; we fail loudly instead.
        if n_trip != 3:
            raise ValueError(
                "bug_parity GAN branch requires RNN_N in 9..11 (the "
                "reference's backward-flow reshape at train.py:144 assumes "
                f"t_size//3 == 3; got t_size={t_size})"
            )
        back = jnp.concatenate(
            [r_inputs[:, 2:t_size:3], r_inputs[:, 1:t_size:3]], axis=1
        ).reshape(t_batch, 2 * C, H, W)
        back_up = upscale_four(back[0:B] * 4.0, layout="NCHW")
        v_nxt = preprocess(back_up.reshape(B, n_trip, 2, H4, W4))
    else:
        # Intended semantics (any T): the backward pseudo-flow of triplet k
        # warps frame 3k+2 toward 3k+1, so mirror the forward construction
        # (train.py:71-77) on the triplet's last frame.
        last = r_inputs[:, 2:t_size:3].reshape(B * n_trip, C, H, W)
        up = upscale_four(last * 4.0, layout="NCHW")[:, 0:2]
        v_nxt = up.reshape(B, n_trip, 2, H4, W4)

    t_vel = jnp.stack([v_pre, v_mid, v_nxt], axis=2)  # (B, n_trip, 3, 2, H4, W4)
    t_vel = t_vel.reshape(B * t_size, H4, W4, 2)  # raw view (train.py:157)
    t_vel = jax.lax.stop_gradient(t_vel)

    # --- crop_dt geometry (train.py:160-164) ----------------------------
    if cfg.crop_dt < 1.0:
        crop_dt = int(H4 * cfg.crop_dt)
        off = (H4 - crop_dt) // 2
        crop_dt = H4 - off * 2

    def crop(x_t9hw):
        if cfg.crop_dt >= 1.0:
            return x_t9hw
        return x_t9hw[:, :, off : off + crop_dt, off : off + crop_dt]

    def crop_pad(x_t9hw):
        if cfg.crop_dt >= 1.0:
            return x_t9hw
        return jnp.pad(crop(x_t9hw), ((0, 0), (0, 0), (off, off), (off, off)))

    fast = not cfg.bug_parity

    # --- real branch (train.py:165-179) ---------------------------------
    real_warp = _warp_nchw(t_tgt, t_vel, fast).reshape(t_batch, 9, H4, W4)

    # --- fake branch (train.py:187-198) ---------------------------------
    fake_vel = (
        t_vel.astype(jnp.float16).astype(jnp.float32) if cfg.bug_parity else t_vel
    )  # T_vel.half() at train.py:187
    fake_warp = _warp_nchw(t_gen, fake_vel, fast).reshape(t_batch, 9, H4, W4)

    if not cfg.Dt_mergeDs:
        # Unmerged Dt: the cropped 9-channel warped triplets go to D
        # directly (train.py:183-184,196-199 intent; no pad-back).
        return crop(real_warp), crop(fake_warp)

    # --- merged 27-channel triplets (train.py:172-179,196-198) ----------
    before_warp = t_tgt.reshape(t_batch, 9, H4, W4)  # train.py:175
    t_input = r_inputs[:, :t_size].reshape(t_batch, 9, H, W)  # train.py:176
    input_hi = upscale_four(t_input, layout="NCHW")  # train.py:178

    real_in = jnp.concatenate([before_warp, crop_pad(real_warp), input_hi], axis=1)
    # NOTE: the reference reuses the *target* before_warp for the fake
    # triplet too (train.py:197 reshapes the existing before_warp).
    fake_in = jnp.concatenate([before_warp, crop_pad(fake_warp), input_hi], axis=1)

    return real_in, fake_in


def apply_discriminator(disc, params_d, batch_stats, x_nchw, mutable: bool):
    """Run D (train-mode batch stats) on an NCHW 27-channel input."""
    variables = {"params": params_d, "batch_stats": batch_stats}
    (score, layers), updates = disc.apply(
        variables, nchw_to_nhwc(x_nchw), train=True, mutable=["batch_stats"]
    )
    new_stats = updates["batch_stats"] if mutable else batch_stats
    return score, layers, new_stats


def d_layer_loss(
    real_layers, fake_layers, cfg: TecoConfig
) -> Tuple[jnp.ndarray, list]:
    """Feature-matching loss over D's 4 intermediate maps
    (train.py:205-237).  Parity mode detaches BOTH sides (train.py:219) —
    the term is then a pure metric; fixed mode detaches the real side only."""
    losses = []
    total = 0.0
    for i, (rl, fl) in enumerate(zip(real_layers, fake_layers)):
        rl = jax.lax.stop_gradient(rl)
        if cfg.bug_parity:
            fl = jax.lax.stop_gradient(fl)
        # layers are NHWC; torch sums dim=3 (width) of NCHW == our axis 2.
        diff = rl.astype(jnp.float32) - fl.astype(jnp.float32)
        ll = jnp.mean(jnp.sum(jnp.abs(diff), axis=2))
        losses.append(ll)
        total = total + FIX_RANGE * ll / D_LAYER_NORM[i]
    return total, losses


def vgg_perceptual_loss(vgg_apply, s_gen_nchw, s_tgt_nchw) -> jnp.ndarray:
    """Perceptual loss over the reference's three VGG taps
    (train.py:124-127, 255-273), fixed formulation.

    Features are unit-normalized over channels, so sum(gen*tgt, axis=3) is
    a per-pixel cosine similarity; minimizing mean(1 - cos) with positive
    vgg_scaling pulls generated features TOWARD the target's (the raw
    dot-product the reference sums at train.py:261 would push them apart
    when added to a minimized loss).
    """
    gen_feats = vgg_apply(nchw_to_nhwc(s_gen_nchw), VGG_LAYER_LABELS)
    tgt_feats = vgg_apply(nchw_to_nhwc(s_tgt_nchw), VGG_LAYER_LABELS)
    vgg_loss = 0.0
    for name in VGG_LAYER_LABELS:
        vgg_loss = vgg_loss + jnp.mean(
            1.0 - jnp.sum(gen_feats[name] * tgt_feats[name], axis=3)
        )
    return vgg_loss


def tecogan_losses(
    gen,
    disc,
    params_g,
    params_d,
    batch_stats_d,
    r_inputs: jnp.ndarray,
    r_targets: jnp.ndarray,
    step: jnp.ndarray,
    cfg: TecoConfig,
    vgg_apply=None,
):
    """Full TecoGAN objective (train.py:49-348).

    Returns (gen_loss, aux) where aux carries the D-loss ingredients,
    metrics, and generator outputs.  Structured so that
    ``jax.grad(..., argnums=params_g)`` reproduces the reference's G update
    and a second small closure over params_d reproduces the D update.
    """
    if cfg.pingpang:
        r_inputs = pingpang_extend(r_inputs)
        r_targets = pingpang_extend(r_targets)

    B, T, C, H, W = r_inputs.shape
    H4, W4 = 4 * H, 4 * W

    unroll = generator_unroll(gen, params_g, r_inputs, cfg)
    gen_outputs = unroll.gen_outputs

    s_gen = gen_outputs.reshape(B * T, 3, H4, W4)
    s_tgt = r_targets.reshape(B * T, 3, H4, W4)

    metrics: Dict[str, jnp.ndarray] = {}

    # content L2 (train.py:239-244)
    content_loss = _mean_sum_w(jnp.square(s_gen - s_tgt))
    metrics["l2_content_loss"] = content_loss
    gen_loss = content_loss
    metrics["l2_warp_loss"] = unroll.warp_loss

    # GAN branch
    real_in, fake_in = assemble_triplets(
        r_inputs, r_targets, gen_outputs, unroll.gen_flow, cfg
    )
    real_score, real_layers, _ = apply_discriminator(
        disc, jax.lax.stop_gradient(params_d), batch_stats_d, real_in, mutable=False
    )
    fake_score, fake_layers, _ = apply_discriminator(
        disc, jax.lax.stop_gradient(params_d), batch_stats_d, fake_in, mutable=False
    )

    if cfg.D_LAYERLOSS:
        sum_layer_loss, layer_losses = d_layer_loss(real_layers, fake_layers, cfg)
        for i, ll in enumerate(layer_losses):
            metrics[f"D_layer_{i}_loss"] = ll
        metrics["D_layer_loss_sum"] = sum_layer_loss

    # VGG perceptual loss (train.py:124-127, 255-273) — fixed formulation
    # (the reference's is broken when enabled; SURVEY component 15).
    if cfg.vgg_scaling > 0.0 and vgg_apply is not None:
        vgg_loss = vgg_perceptual_loss(vgg_apply, s_gen, s_tgt)
        gen_loss = gen_loss + cfg.vgg_scaling * vgg_loss
        metrics["vgg_all"] = vgg_loss

    # Reference aliasing quirk (bug_parity): ``gen_loss = content_loss;
    # fnet_loss = content_loss`` bind the SAME tensor, and torch ``+=`` is
    # in-place — so the fnet accumulations (train.py:283,295, dead FNet)
    # land on gen_loss too.  Net effect: ping-pong and adversarial terms
    # are added TWICE, and the mutated tensor sits in update_list, so the
    # reference's logged "l2_content_loss" IS the final gen loss.  Grads
    # are unaffected in parity mode (both doubled terms are detached).
    alias_mult = 2.0 if cfg.bug_parity else 1.0

    # ping-pong L1 (train.py:275-285)
    if cfg.pingpang:
        first = gen_outputs[:, 0 : cfg.RNN_N - 1]
        last_rev = jnp.flip(gen_outputs, axis=1)[:, 0 : cfg.RNN_N - 1]
        pploss = jnp.mean(jnp.abs(first - last_rev))
        if cfg.pp_scaling > 0:
            gen_loss = gen_loss + alias_mult * pploss * cfg.pp_scaling
        metrics["PingPang"] = pploss

    # adversarial terms (train.py:287-300)
    eps = cfg.EPS
    fake_for_gen = (
        jax.lax.stop_gradient(fake_score) if cfg.bug_parity else fake_score
    )
    t_adversarial_loss = jnp.mean(-jnp.log(fake_for_gen + eps))
    d_adversarial_loss = jnp.mean(-jnp.log(fake_score + eps))
    global_step = step + 1  # Global_step += 1 at train.py:52
    dt_ratio = jnp.minimum(
        cfg.Dt_ratio_max, cfg.Dt_ratio_0 + cfg.Dt_ratio_add * global_step.astype(jnp.float32)
    )
    gen_loss = gen_loss + alias_mult * cfg.ratio * t_adversarial_loss
    metrics["t_adversarial_loss"] = t_adversarial_loss
    if cfg.D_LAYERLOSS:
        gen_loss = gen_loss + sum_layer_loss * dt_ratio

    # discriminator loss ingredients (train.py:303-327)
    t_discrim_loss = jnp.mean(
        -(jnp.log(1.0 - fake_score + eps) + jnp.log(real_score + eps))
    )
    t_balance = jnp.mean(jnp.log(real_score + eps)) + d_adversarial_loss
    tb = 0.99 * t_balance  # per-step-reinstantiated EMA quirk (train.py:324-327)

    metrics["t_discrim_loss"] = t_discrim_loss
    metrics["t_discrim_real_output"] = jnp.mean(real_score)
    metrics["t_discrim_fake_output"] = jnp.mean(fake_score)
    metrics["All_loss_Gen"] = gen_loss
    if cfg.bug_parity:
        # the aliased tensor in update_list reads as the FINAL gen loss
        # (see alias_mult note above); the true content term is preserved
        # under a _true suffix.
        metrics["l2_content_loss_true"] = metrics["l2_content_loss"]
        metrics["l2_content_loss"] = gen_loss
    metrics["t_balance"] = tb
    metrics["Dst_ratio"] = dt_ratio

    if cfg.bug_parity:
        # Reference metric-EMA quirk (train.py:330-333): ONE shadow slot
        # "Loss_average" is registered (zero-init) and then forward()'d
        # sequentially over the whole update_list, so each avg leaks 1% of
        # the PREVIOUS metric's avg: avg_i = 0.99*x_i + 0.01*avg_{i-1}.
        # Reproduced in the reference's exact list order; tb (already
        # 0.99x) and Dst_ratio are appended after the comprehension,
        # unscaled (train.py:345-348).  Verified value-for-value against
        # the real reference in tests/test_reference_parity.py.
        chain = []
        if cfg.D_LAYERLOSS:
            chain += [f"D_layer_{i}_loss" for i in range(4)]
            chain += ["D_layer_loss_sum"]
        chain += ["l2_content_loss", "l2_warp_loss"]
        if "vgg_all" in metrics:
            # the reference would chain vgg_loss_2..4 first (train.py:270),
            # but its VGG path crashes when enabled — only the total is
            # emitted here.
            chain += ["vgg_all"]
        if cfg.pingpang:
            chain += ["PingPang"]
        chain += [
            "t_adversarial_loss", "t_discrim_loss",
            "t_discrim_real_output", "t_discrim_fake_output", "All_loss_Gen",
        ]
        shadow = jnp.zeros((), jnp.float32)
        for k in chain:
            shadow = 0.99 * metrics[k] + 0.01 * shadow
            metrics[f"{k}_avg"] = shadow

    aux = {
        "metrics": metrics,
        "gen_outputs": gen_outputs,
        "real_in": jax.lax.stop_gradient(real_in),
        "fake_in": jax.lax.stop_gradient(fake_in),
    }
    return gen_loss, aux


def discriminator_loss(
    disc, params_d, batch_stats_d, real_in, fake_in, cfg: TecoConfig
):
    """D objective (train.py:303-321): BCE-style log loss on real/fake
    triplets; running BN stats updated real-then-fake like the reference's
    call order (train.py:181,199)."""
    real_score, _, stats1 = apply_discriminator(
        disc, params_d, batch_stats_d, real_in, mutable=True
    )
    fake_score, _, stats2 = apply_discriminator(
        disc, params_d, stats1, fake_in, mutable=True
    )
    eps = cfg.EPS
    loss = jnp.mean(
        -(jnp.log(1.0 - fake_score + eps) + jnp.log(real_score + eps))
    )
    return loss, stats2
