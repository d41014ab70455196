#!/usr/bin/env python3
"""Bisect the fused inference scan's per-stage cost by timing full-clip
variants with individual stages stubbed out (per-op timing is impossible
through the remote-TPU tunnel — dispatch latency dominates single calls).

Stage cost = time(variant with stage) - time(variant without it).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.engine import init_state
    from tecogan_tpu.engine.state import model_defs
    from tecogan_tpu.engine import fused as F
    from tecogan_tpu.models.generator import Generator

    H, W = 270, 480
    T = int(os.environ.get("BENCH_FRAMES", "16"))
    reps = int(os.environ.get("BENCH_REPS", "2"))

    cfg = TecoConfig(precision="bf16", num_resblock=16, bug_parity=False)
    state = init_state(cfg.replace(crop_size=8), jax.random.PRNGKey(0))
    params_g = state.params_g
    gen, _ = model_defs(cfg)
    gen = dataclasses.replace(gen, out_dtype=jnp.bfloat16)
    variables = {"params": params_g}

    def make_infer(stub_tail=False, stub_warp=False, stub_first=False,
                   stub_out=False, stub_coords=False, stub_gather=False,
                   stub_combine=False):
        def body(carry, xs):
            prev_lr, cur_lr = xs
            B = prev_lr.shape[0]
            if stub_warp:
                warped = F.s2d_to_frame(carry)
            elif stub_coords or stub_gather or stub_combine:
                if stub_coords:
                    # data-dependent but einsum-free fake coords
                    base = jnp.mean(prev_lr, axis=(1, 2, 3))[:, None, None]
                    ix = jnp.broadcast_to(
                        jnp.arange(4 * W, dtype=jnp.float32)[None, None, :] * 0.99
                        + base, (B, 4 * H, 4 * W))
                    iy = jnp.broadcast_to(
                        jnp.arange(4 * H, dtype=jnp.float32)[None, :, None] * 0.99
                        + base, (B, 4 * H, 4 * W))
                else:
                    ix, iy = F.planar_pseudo_flow_coords(prev_lr)
                if stub_gather:
                    table = F.build_packed_table_s2d(carry)
                    rows = jnp.broadcast_to(
                        table[:, :1, :30], (B, ix.shape[1] * ix.shape[2], 30)
                    ).reshape(B * ix.shape[1] * ix.shape[2], 2, 5, 3)
                    # run the real combine arithmetic on fake rows
                    wx = (ix - jnp.floor(ix)).reshape(-1)[:, None]
                    warped = (
                        rows[:, 0, 0].astype(jnp.bfloat16) * (1 - wx).astype(jnp.bfloat16)
                        + rows[:, 1, 1].astype(jnp.bfloat16) * wx.astype(jnp.bfloat16)
                    ).reshape(B, 4 * H, 4 * W, 3) * jnp.bfloat16(1 / 255.)
                elif stub_combine:
                    table = F.build_packed_table_s2d(carry)
                    cols = W * 4 // 4
                    xb = jnp.clip(jnp.floor(ix), 0, 4 * W - 1).astype(jnp.int32)
                    yb = jnp.clip(jnp.floor(iy), 0, 4 * H - 1).astype(jnp.int32)
                    idx = (yb * cols + xb // 4).reshape(-1)
                    R = table.shape[1]
                    if B > 1:
                        idx = idx + jnp.repeat(
                            jnp.arange(B, dtype=idx.dtype) * R,
                            idx.shape[0] // B)
                    rows = jnp.take(table.reshape(B * R, table.shape[-1]),
                                    idx, axis=0)
                    warped = (rows[:, :3].astype(jnp.bfloat16)
                              * jnp.bfloat16(1 / 255.)).reshape(
                                  B, 4 * H, 4 * W, 3)
                else:
                    warped = F.warp_s2d_carry(carry, ix, iy)
            else:
                ix, iy = F.planar_pseudo_flow_coords(prev_lr)
                warped = F.warp_s2d_carry(carry, ix, iy)
            if stub_first:
                # cheap but data-dependent: one reduction over the warped
                # frame (12 MB read), no conv / s2d / relayout work
                net = jnp.broadcast_to(
                    jnp.mean(warped).astype(gen.dtype), (B, H, W, 64))
            else:
                net = F.fused_first_layer(params_g, cur_lr, warped,
                                          dtype=gen.dtype)
            if stub_tail:
                feat = jnp.tile(
                    net[:, :, None, :, None, :], (1, 1, 4, 1, 4, 1)
                ).reshape(B, 4 * H, 4 * W, 64)
            else:
                feat = gen.apply(variables, net, method=Generator.tail_features)
            if stub_out:
                # one reduction over feat (265 MB read) -> constant carry
                sr = jnp.broadcast_to(
                    jax.nn.sigmoid(jnp.mean(feat)).astype(jnp.bfloat16),
                    (B, H, W, 48))
            else:
                sr = F.conv_out_s2d(
                    feat, params_g["conv_out"]["kernel"],
                    params_g["conv_out"]["bias"])
            return sr, sr

        def infer(params_g_, clip):
            B = clip.shape[0]
            frames = jnp.moveaxis(clip, 1, 0)
            sr0 = F.fused_first_frame_s2d(
                gen, variables, params_g_, clip[:, 0]
            )
            _, rest = jax.lax.scan(body, sr0, (frames[:-1], frames[1:]))
            return rest

        return jax.jit(infer)

    import json as _json

    sel = os.environ.get("VARIANTS", "")
    variants = [
        ("full", {}),
        ("-tail", dict(stub_tail=True)),
        ("-warp", dict(stub_warp=True)),
        ("-first", dict(stub_first=True)),
        ("-out", dict(stub_out=True)),
        ("-tail-warp", dict(stub_tail=True, stub_warp=True)),
        ("-coords", dict(stub_coords=True)),
        ("gatheronly", dict(stub_combine=True)),
        ("combineonly", dict(stub_gather=True)),
    ]
    if sel:
        names = sel.split(",")
        variants = [v for v in variants if v[0] in names]

    rng = np.random.default_rng(0)
    for B in [int(a) for a in sys.argv[1:]] or [1, 2]:
        clip = jnp.asarray(rng.random((B, T, H, W, 3), np.float32))
        for name, kw in variants:
            infer = make_infer(**kw)
            out = infer(params_g, clip)
            _ = float(jnp.sum(out[-1, :, ::97]))
            t0 = time.time()
            for _ in range(reps):
                out = infer(params_g, clip)
            _ = float(jnp.sum(out[-1, :, ::97]))
            dt = (time.time() - t0) / reps / (T - 1) * 1000
            print(f"B={B} {name:12s} {dt:7.2f} ms/frame", flush=True)
            del out


if __name__ == "__main__":
    main()
