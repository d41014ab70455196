#!/usr/bin/env python3
"""Real-content evaluation against the reference's shipped media
(VERDICT r2 Missing #4: every prior quality number was synthetic).

The reference ships a genuine LR/HR pair from a real video plus its own
trained model's output on that clip (all 10 frames):
  * /root/reference/original.gif — 32x32 LR input
  * /root/reference/real.gif     — 128x128 ground truth (4x)
  * /root/reference/gan.gif      — the reference model's SR output
and real footage in Resources/ (tecoGAN-spider.gif, 30 frames 255x422).

What this script scores (all PSNR/SSIM, [0,1]):
  1. the reference's own gan.gif vs real.gif — the quality anchor its
     2,100-epoch RTX-2080 run actually achieved on its showcase clip;
  2. bicubic-4x(original.gif) vs real.gif — the no-model baseline;
  3. (with --g_checkpoint) OUR model run on original.gif vs real.gif;
  4. (with --g_checkpoint) the spider clip: HR = center-crop to a /4
     grid, LR = bilinear 4x downscale (the training degradation), our SR
     vs HR, next to its bicubic baseline.

Writes eval/real_eval_r3.json.  CPU-safe (JAX_PLATFORMS honored).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def load_gif(path: str) -> np.ndarray:
    import imageio.v2 as imageio

    frames = imageio.mimread(path, memtest=False)
    out = []
    for f in frames:
        a = np.asarray(f)
        if a.ndim == 2:
            a = np.stack([a] * 3, axis=-1)
        out.append(a[..., :3])
    return np.stack(out).astype(np.float32) / 255.0


def bicubic4x(lr: np.ndarray) -> np.ndarray:
    import cv2

    return np.stack([
        cv2.resize(f, (f.shape[1] * 4, f.shape[0] * 4),
                   interpolation=cv2.INTER_CUBIC)
        for f in lr
    ]).clip(0.0, 1.0)


def score(sr: np.ndarray, hr: np.ndarray) -> dict:
    import jax.numpy as jnp

    from tecogan_tpu.ops.metrics import psnr, psnr_per_frame, ssim

    T = min(len(sr), len(hr))
    sr_j, hr_j = jnp.asarray(sr[:T]), jnp.asarray(hr[:T])
    return {
        "frames": int(T),
        "psnr_db": float(jnp.mean(psnr_per_frame(hr_j, sr_j))),
        "psnr_global_db": float(psnr(hr_j, sr_j)),
        "ssim": float(ssim(sr_j, hr_j)),
    }


def run_model(ckpt: str, lr_clip: np.ndarray, num_resblock: int,
              int8: bool = False) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.engine import build_clip_inference
    from tecogan_tpu.engine.state import model_defs
    from tecogan_tpu.utils.checkpoint import load_generator_params

    cfg = TecoConfig(num_resblock=num_resblock, precision="bf16",
                     bug_parity=False)
    gen, _ = model_defs(cfg)
    template = gen.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 51), jnp.float32)
    )["params"]
    params = load_generator_params(ckpt, template)
    clip = jnp.asarray(lr_clip)[None]
    if int8:
        from tecogan_tpu.engine.inference import (
            build_quantized_clip_inference,
        )

        prepare_q, qinfer = build_quantized_clip_inference(cfg)
        qtail = prepare_q(params, clip)
        return np.asarray(qinfer(params, qtail, clip)[0])
    infer = build_clip_inference(cfg)
    return np.asarray(infer(params, clip)[0])


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--g_checkpoint", default=None,
                   help="trained generator .ckpt; without it only the "
                        "reference-output and bicubic anchors are scored")
    p.add_argument("--num_resblock", type=int, default=16)
    p.add_argument("--json_out", default="eval/real_eval_r4.json")
    p.add_argument("--spider_frames", type=int, default=30)
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                   help="force a jax backend (this image's sitecustomize "
                        "pre-imports jax with the remote-TPU plugin, so a "
                        "plain env var is too late)")
    p.add_argument("--int8", action="store_true",
                   help="also score the int8 (W8A8) serving path on the "
                        "showcase clip, plus its PSNR vs the bf16 output "
                        "(quantization fidelity on real content)")
    p.add_argument("--adapt", type=int, default=0,
                   help="also score ZSSR test-time adaptation: fine-tune "
                        "the checkpoint on each clip's own internal pairs "
                        "for this many steps (engine/adapt.py), rows "
                        "ours_zssr_*")
    p.add_argument("--adapt_lr", type=float, default=1e-4)
    p.add_argument("--adapt_consistency", type=float, default=2.0)
    p.add_argument("--refine", type=int, default=0,
                   help="post-hoc back-projection iters on the adapted SR")
    p.add_argument("--record_suffix", default="",
                   help="suffix for the model record keys (e.g. '_ft' for "
                        "a fine-tuned checkpoint); with a suffix, existing "
                        "records in --json_out are merged, not overwritten")
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    records = {}

    lr = load_gif(os.path.join(REF, "original.gif"))
    hr = load_gif(os.path.join(REF, "real.gif"))
    gan = load_gif(os.path.join(REF, "gan.gif"))
    print(f"showcase clip: LR {lr.shape}, HR {hr.shape}")

    records["reference_gan_vs_real"] = score(gan, hr)
    records["bicubic4x_vs_real"] = score(bicubic4x(lr), hr)
    print("reference gan.gif :", records["reference_gan_vs_real"])
    print("bicubic baseline  :", records["bicubic4x_vs_real"])

    spider = load_gif(os.path.join(REF, "Resources", "tecoGAN-spider.gif"))
    # center-crop to a multiple of 16 in both dims (255x422 -> 240x416)
    # so the LR clip is itself /4-divisible (internal ZSSR pairs need
    # LR -> LR/4; r3 used %4 crops = 252x420, numbers shift a little)
    H = spider.shape[1] - spider.shape[1] % 16
    W = spider.shape[2] - spider.shape[2] % 16
    spider_hr = spider[: args.spider_frames, :H, :W]
    import cv2

    spider_lr = np.stack([
        cv2.resize(f, (W // 4, H // 4), interpolation=cv2.INTER_LINEAR)
        for f in spider_hr
    ])
    records["spider_bicubic4x"] = score(bicubic4x(spider_lr), spider_hr)
    print("spider bicubic    :", records["spider_bicubic4x"])

    if args.g_checkpoint:
        sfx = args.record_suffix
        sr = run_model(args.g_checkpoint, lr, args.num_resblock)
        records["ours_vs_real" + sfx] = score(sr, hr)
        print("OUR model         :", records["ours_vs_real" + sfx])

        sr_spider = run_model(args.g_checkpoint, spider_lr, args.num_resblock)
        records["spider_ours" + sfx] = score(sr_spider, spider_hr)
        print("OUR model (spider):", records["spider_ours" + sfx])

        if args.adapt:
            from tecogan_tpu.engine.adapt import (
                adapt_generator, lr_consistency_refine,
            )

            def adapted_sr(lr_clip):
                import jax
                import jax.numpy as jnp

                from tecogan_tpu.config import TecoConfig
                from tecogan_tpu.engine.inference import build_clip_inference
                from tecogan_tpu.engine.state import model_defs
                from tecogan_tpu.utils.checkpoint import load_generator_params

                cfg = TecoConfig(num_resblock=args.num_resblock,
                                 precision="bf16", bug_parity=False)
                gen, _ = model_defs(cfg)
                template = gen.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, 8, 8, 51), jnp.float32))["params"]
                params = load_generator_params(args.g_checkpoint, template)
                adapted, report = adapt_generator(
                    cfg, params, lr_clip, steps=args.adapt,
                    learning_rate=args.adapt_lr,
                    consistency=args.adapt_consistency, guard=True)
                out = np.asarray(build_clip_inference(cfg)(
                    adapted, jnp.asarray(lr_clip)[None])[0])
                if args.refine:
                    out = lr_consistency_refine(out, lr_clip,
                                                iters=args.refine)
                return out, report

            sr_z, rep_z = adapted_sr(lr)
            records["ours_zssr_vs_real" + sfx] = dict(score(sr_z, hr),
                                                      guard=rep_z)
            print("OUR zssr          :", records["ours_zssr_vs_real" + sfx])
            sr_zs, rep_zs = adapted_sr(spider_lr)
            records["spider_ours_zssr" + sfx] = dict(score(sr_zs, spider_hr),
                                                     guard=rep_zs)
            print("OUR zssr (spider) :", records["spider_ours_zssr" + sfx])
            context_adapt = {
                "zssr": f"test-time adaptation: {args.adapt} steps, "
                        f"lr {args.adapt_lr}, consistency "
                        f"{args.adapt_consistency}, refine {args.refine} "
                        "(engine/adapt.py, no external data)"}
        else:
            context_adapt = {}

        if args.int8:
            sr8 = run_model(args.g_checkpoint, lr, args.num_resblock,
                            int8=True)
            records["ours_int8_vs_real" + sfx] = score(sr8, hr)
            records["ours_int8_vs_bf16" + sfx] = score(sr8, sr)
            print("OUR int8          :", records["ours_int8_vs_real" + sfx])
            print("int8 vs bf16      :", records["ours_int8_vs_bf16" + sfx])

    context = {
        "source": "reference-shipped media (original/real/gan.gif, "
                  "Resources/tecoGAN-spider.gif) — real video frames, "
                  "not synthetic",
        "checkpoint" + args.record_suffix: args.g_checkpoint,
        "degradation": "spider LR = bilinear 4x downscale (the "
                       "training pairing); showcase LR = the "
                       "reference's own original.gif",
    }
    if args.g_checkpoint and args.adapt:
        context.update(context_adapt)
    if args.record_suffix and os.path.exists(args.json_out):
        with open(args.json_out) as f:
            prev = json.load(f)
        merged_r = prev.get("records", {})
        merged_r.update(records)
        records = merged_r
        merged_c = prev.get("context", {})
        merged_c.update(context)
        context = merged_c

    out = {"records": records, "context": context}
    os.makedirs(os.path.dirname(os.path.abspath(args.json_out)), exist_ok=True)
    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.json_out)


if __name__ == "__main__":
    main()
