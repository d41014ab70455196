#!/usr/bin/env python3
"""Adapt the generator to ONE clip (ZSSR-style test-time training) and
optionally serve + score it.

    python tools/adapt_clip.py --input clip.gif --g_checkpoint gen.ckpt \
        --steps 1000 --out_ckpt adapted.ckpt --out_sr sr.mp4 [--gt hr.gif]

The same machinery the CLI runs under ``--adapt_steps`` (engine/adapt.py):
internal LR->LR/4 pairs from the clip + serving-scale LR-consistency.
No external data needed — reference anchor: its 2,100-epoch offline run
is the only quality mechanism it has (/root/reference/README.md:21).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_clip(path: str, frames: int = 0) -> np.ndarray:
    """(T, H, W, 3) float32 [0,1] from a gif/mp4/image-folder."""
    if os.path.isdir(path):
        import imageio.v2 as imageio

        names = sorted(os.listdir(path))
        clip = np.stack([
            np.asarray(imageio.imread(os.path.join(path, n)))[..., :3]
            for n in names if n.lower().endswith((".png", ".jpg", ".jpeg"))
        ])
        clip = clip.astype(np.float32) / 255.0
    elif path.lower().endswith(".gif"):
        import imageio.v2 as imageio

        fr = imageio.mimread(path, memtest=False)
        out = []
        for f in fr:
            a = np.asarray(f)
            if a.ndim == 2:
                a = np.stack([a] * 3, axis=-1)
            out.append(a[..., :3])
        clip = np.stack(out).astype(np.float32) / 255.0
    else:
        import cv2

        cap = cv2.VideoCapture(path)
        out = []
        while True:
            ok, bgr = cap.read()
            if not ok:
                break
            out.append(bgr[..., ::-1].astype(np.float32) / 255.0)
        cap.release()
        clip = np.stack(out)
    return clip[:frames] if frames else clip


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="LR clip (gif/mp4/dir)")
    p.add_argument("--g_checkpoint", required=True)
    p.add_argument("--num_resblock", type=int, default=16)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--consistency", type=float, default=2.0)
    p.add_argument("--frames", type=int, default=40,
                   help="cap frames used for internal pairs (0 = all)")
    p.add_argument("--out_ckpt", default="", help="save adapted params")
    p.add_argument("--out_sr", default="", help="write the SR clip")
    p.add_argument("--refine", type=int, default=0,
                   help="post-hoc back-projection iters on the SR output")
    p.add_argument("--gt", default="", help="score SR against this HR clip")
    p.add_argument("--json_out", default="", help="append scores to JSON")
    p.add_argument("--record_suffix", default="")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.engine.adapt import adapt_generator, lr_consistency_refine
    from tecogan_tpu.engine.inference import build_clip_inference
    from tecogan_tpu.engine.state import model_defs
    from tecogan_tpu.utils.checkpoint import (
        load_generator_params, save_generator_params,
    )

    cfg = TecoConfig(num_resblock=args.num_resblock, precision="bf16",
                     bug_parity=False)
    gen, _ = model_defs(cfg)
    template = gen.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 51), jnp.float32)
    )["params"]
    params = load_generator_params(args.g_checkpoint, template)

    clip = load_clip(args.input)
    print(f"clip: {clip.shape[0]} frames {clip.shape[1]}x{clip.shape[2]}")
    adapted, report = adapt_generator(
        cfg, params, clip[: args.frames] if args.frames else clip,
        steps=args.steps, learning_rate=args.lr,
        consistency=args.consistency, log_every=max(args.steps // 8, 1),
        guard=True,
    )
    print("guard report:", report)
    if args.out_ckpt:
        save_generator_params(args.out_ckpt, adapted)
        print(f"adapted params -> {args.out_ckpt}")

    sr = np.asarray(build_clip_inference(cfg)(adapted, jnp.asarray(clip)[None])[0])
    if args.refine:
        sr = lr_consistency_refine(sr, clip, iters=args.refine)
    if args.out_sr:
        from tecogan_tpu.ops.image import save_as_media

        save_as_media(sr, args.out_sr)
        print(f"SR clip -> {args.out_sr}")

    if args.gt:
        from real_eval import score  # noqa: F401 (same scorer as the harness)

        gt = load_clip(args.gt)
        rec = score(sr, gt)
        print("score:", rec)
        if args.json_out:
            data = {"records": {}, "context": {}}
            if os.path.exists(args.json_out):
                with open(args.json_out) as f:
                    data = json.load(f)
            key = "ours_adapted" + (
                f"_{args.record_suffix}" if args.record_suffix else "")
            data.setdefault("records", {})[key] = rec
            data.setdefault("context", {})[key] = {
                "steps": args.steps, "lr": args.lr,
                "consistency": args.consistency, "refine": args.refine,
                "checkpoint": args.g_checkpoint,
            }
            with open(args.json_out, "w") as f:
                json.dump(data, f, indent=2)
            print(f"scores appended -> {args.json_out}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
