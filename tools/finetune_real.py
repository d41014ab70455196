#!/usr/bin/env python3
"""Reproducible few-shot fine-tune on the reference's OTHER shipped media
(VERDICT r3 Missing #3 / Next #4): materialize 5 real-content scenes —
the four 360x324 panels of Resources/gif_summary_example.gif (75 frames,
ping-pong-extended to 120) plus Resources/tecoGAN-spider.gif (30 frames,
240x416 crop, ping-pong-extended) — fine-tune a base checkpoint a few
epochs, then score the UNTOUCHED showcase clip via tools/real_eval.py
--record_suffix _ft.

    python tools/finetune_real.py --base_dir <run-with-ckpts> \
        --out_dir /tmp/ft_run --epochs 8 [--eval]

The showcase clip (original/real/gan.gif) is never trained on.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def _pingpong_to(clip: np.ndarray, n: int) -> np.ndarray:
    """Extend a (T, H, W, 3) clip to n frames by forward/backward cycling."""
    cycle = np.concatenate([clip, clip[-2:0:-1]], axis=0)
    reps = int(np.ceil(n / len(cycle)))
    return np.concatenate([cycle] * reps, axis=0)[:n]


def materialize_scenes(root: str, frames: int = 120) -> int:
    """Write the 5 few-shot scenes in the reference's on-disk layout
    (scene_%04d/col_high_%04d.png, dataprepare.py:148)."""
    import imageio.v2 as imageio

    def write_scene(idx: int, clip: np.ndarray) -> None:
        d = os.path.join(root, f"scene_{idx:04d}")
        os.makedirs(d, exist_ok=True)
        for t, f in enumerate(clip):
            imageio.imwrite(os.path.join(d, f"col_high_{t:04d}.png"),
                            (np.clip(f, 0, 1) * 255).astype(np.uint8))

    gs = imageio.mimread(os.path.join(REF, "Resources",
                                      "gif_summary_example.gif"),
                         memtest=False)
    gs = np.stack([np.asarray(f)[..., :3] for f in gs]).astype(np.float32) / 255.0
    T, H, W, _ = gs.shape  # 75 x 720 x 648
    h2, w2 = H // 2, W // 2
    panels = [gs[:, :h2, :w2], gs[:, :h2, w2:], gs[:, h2:, :w2],
              gs[:, h2:, w2:]]
    idx = 1000
    for pnl in panels:
        ph = pnl.shape[1] - pnl.shape[1] % 4
        pw = pnl.shape[2] - pnl.shape[2] % 4
        write_scene(idx, _pingpong_to(pnl[:, :ph, :pw], frames))
        idx += 1

    sp = imageio.mimread(os.path.join(REF, "Resources",
                                      "tecoGAN-spider.gif"), memtest=False)
    sp = np.stack([np.asarray(f)[..., :3] for f in sp]).astype(np.float32) / 255.0
    sh = sp.shape[1] - sp.shape[1] % 16
    sw = sp.shape[2] - sp.shape[2] % 16
    write_scene(idx, _pingpong_to(sp[:, :sh, :sw], frames))
    return idx - 1000 + 1


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base_dir", required=True,
                   help="directory with generator.ckpt + discrim.ckpt to "
                        "fine-tune from")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--steps_per_epoch", type=int, default=150)
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--num_resblock", type=int, default=16)
    p.add_argument("--scene_dir", default="",
                   help="reuse an existing materialized scene dir")
    p.add_argument("--eval", action="store_true",
                   help="run tools/real_eval.py --record_suffix _ft after")
    p.add_argument("--json_out", default="eval/real_eval_r4.json")
    args = p.parse_args(argv)

    from tecogan_tpu.cli.main import run_train
    from tecogan_tpu.config import TecoConfig

    scenes = args.scene_dir or os.path.join(args.out_dir, "scenes")
    if not os.path.isdir(scenes) or not os.listdir(scenes):
        n = materialize_scenes(scenes)
        print(f"materialized {n} few-shot scenes -> {scenes}")

    os.makedirs(args.out_dir, exist_ok=True)
    # seed the run with the base checkpoints, then resume-train in place
    for name in ("generator.ckpt", "discrim.ckpt"):
        src = os.path.join(args.base_dir, name)
        dst = os.path.join(args.out_dir, name)
        if not os.path.exists(dst):
            shutil.copy(src, dst)

    # the seeded checkpoint carries the base run's epoch counter — extend
    # max_epochs past it so auto_resume trains exactly args.epochs more
    from tecogan_tpu.utils.checkpoint import load_flat

    _, meta = load_flat(os.path.join(args.out_dir, "generator.ckpt"))
    base_epoch = int(meta.get("epoch", 0))

    cfg = TecoConfig(
        mode="train", input_video_dir=scenes, str_dir=1000, end_dir=1004,
        end_dir_val=1004, batch_size=4, crop_size=32, RNN_N=10,
        num_resblock=args.num_resblock, precision="bf16", bug_parity=False,
        pingpang=True, vgg_scaling=0.2, vgg_ckpt="surrogate",
        learning_rate=args.learning_rate,
        max_epochs=base_epoch + args.epochs,
        steps_per_epoch=args.steps_per_epoch,
        checkpoint_every=1, validate_every=0, auto_resume=True,
        queue_thread=4, log_every=50, transfer_dtype="u8",
        output_dir=args.out_dir,
        summary_dir=os.path.join(args.out_dir, "summary"),
    )
    run_train(cfg)
    print(f"fine-tuned checkpoints in {args.out_dir}")

    if args.eval:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import real_eval

        real_eval.main([
            "--g_checkpoint", os.path.join(args.out_dir, "generator.ckpt"),
            "--num_resblock", str(args.num_resblock),
            "--json_out", args.json_out,
            "--record_suffix", "_ft",
        ])


if __name__ == "__main__":
    main()
