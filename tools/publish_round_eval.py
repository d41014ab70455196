#!/usr/bin/env python3
"""Publish the round's synthetic convergence evidence as one artifact.

VERDICT r3 Weak #1 asked for a claims-vs-artifacts close-out: eval JSONs
must be produced by a rerunnable script, not assembled by hand.  This
script builds `eval/synthetic_eval_r{N}.json` from a convergence run
directory (tools/run_convergence_r4.sh layout):

  * held-out eval: cli.evaluate on the disjoint-seed scenes 2100-2102
    (unified train/eval degradation, 40 frames/clip) with the run's
    final generator checkpoint, plus the bicubic-4x anchor per scene;
  * the FULL validation PSNR trajectory from summary/train_metrics.jsonl
    (every val_psnr_db record, not hand-picked epochs);
  * run context (epoch count, steps, wall time) read from the artifacts.

    python tools/publish_round_eval.py --run_dir /root/data_r4/run1 \
        --scene_dir /root/data_r4/scenes --out eval/synthetic_eval_r4.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bicubic_anchor(scene_dir: str, crop: int, frames: int) -> dict:
    """PSNR of bicubic-4x-upscaled LR vs HR under the same protocol."""
    import cv2
    import jax.numpy as jnp

    from tecogan_tpu.cli.evaluate import _load_frames
    from tecogan_tpu.ops.metrics import psnr_per_frame, ssim

    src = _load_frames(scene_dir)[:frames]
    hr = np.stack([cv2.resize(f, (crop * 4, crop * 4)) for f in src])
    lr = np.stack([cv2.resize(f, (crop, crop)) for f in src])
    up = np.stack([cv2.resize(f, (crop * 4, crop * 4),
                              interpolation=cv2.INTER_CUBIC) for f in lr])
    return {
        "psnr_db": float(jnp.mean(psnr_per_frame(jnp.asarray(hr),
                                                 jnp.asarray(up)))),
        "ssim": float(ssim(jnp.asarray(up), jnp.asarray(hr))),
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", required=True)
    p.add_argument("--scene_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--eval_scenes", default="2100,2101,2102")
    p.add_argument("--crop_size", type=int, default=64)
    p.add_argument("--limit_frames", type=int, default=40)
    p.add_argument("--num_resblock", type=int, default=16)
    p.add_argument("--context_note", default="")
    p.add_argument("--train_tflop_per_step", type=float, default=3.297,
                   help="analytic TFLOP per optimizer step for the run's "
                        "config (utils/flops.py train_step_macs * 2; "
                        "default = the convergence config: batch 4, crop "
                        "32, RNN 10, ping-pong, fixed semantics)")
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                   help="force a JAX backend (the image's sitecustomize "
                        "overrides JAX_PLATFORMS env with the remote-TPU "
                        "plugin; jax.config wins over it)")
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from tecogan_tpu.cli import evaluate as ev

    # 1. held-out model eval into a temp holding dir layout
    scenes = [f"scene_{int(s):04d}" for s in args.eval_scenes.split(",")]
    hold = os.path.join(args.run_dir, "_eval_scenes")
    os.makedirs(hold, exist_ok=True)
    for s in scenes:
        dst = os.path.join(hold, s)
        if not os.path.exists(dst):
            os.symlink(os.path.join(os.path.abspath(args.scene_dir), s), dst)

    tmp_json = os.path.join(args.run_dir, "_heldout.json")
    ev.main([
        "--g_checkpoint", os.path.join(args.run_dir, "generator.ckpt"),
        "--input_dir_HR", hold,
        "--crop_size", str(args.crop_size),
        "--num_resblock", str(args.num_resblock),
        "--limit_frames", str(args.limit_frames),
        "--bug_parity", "false",
        "--vgg_ckpt", "surrogate",
        "--json_out", tmp_json,
    ])
    heldout = json.load(open(tmp_json))

    # 2. validation trajectory + run context from the summary JSONL.
    # A resumed run may re-log an epoch (ADVICE r4): keep EVERY record —
    # duplicate epochs become a list instead of silently rewriting history.
    traj, last = {}, {}
    jsonl = os.path.join(args.run_dir, "summary", "train_metrics.jsonl")
    with open(jsonl) as f:
        for line in f:
            rec = json.loads(line)
            if "val_psnr_db" in rec:
                key = f"epoch{rec['epoch'] + 1}"
                val = round(float(rec["val_psnr_db"]), 3)
                if key in traj:
                    prev = traj[key]
                    traj[key] = (prev if isinstance(prev, list)
                                 else [prev]) + [val]
                else:
                    traj[key] = val
            last = rec

    # wall-clock train MFU (VERDICT r4 Next #7): per-step wall time from
    # consecutive record deltas (wall_time resets on auto-resume restarts
    # — negative/zero deltas are dropped), against the v5e 197 TFLOP/s
    # bf16 peak.  This is the HONEST number: it includes host data
    # loading, H2D, and logging, not just device compute.
    deltas = []
    prev_wall = prev_step = None
    with open(jsonl) as f:
        for line in f:
            rec = json.loads(line)
            if "wall_time" not in rec or "step" not in rec:
                continue
            if prev_wall is not None and rec["wall_time"] > prev_wall \
                    and rec["step"] > prev_step:
                deltas.append((rec["wall_time"] - prev_wall)
                              / (rec["step"] - prev_step))
            prev_wall, prev_step = rec["wall_time"], rec["step"]
    ms_per_step = float(np.median(deltas) * 1000.0) if deltas else None
    train_mfu = (args.train_tflop_per_step / (ms_per_step / 1000.0) / 197.0
                 if ms_per_step else None)

    # 3. bicubic anchors
    anchors = {}
    for s in scenes:
        anchors[s] = bicubic_anchor(os.path.join(args.scene_dir, s),
                                    args.crop_size, args.limit_frames)
    anchors["aggregate_psnr_db"] = float(
        np.mean([a["psnr_db"] for a in anchors.values()]))

    # exact provenance of the SCORED checkpoint from its own metadata
    # (ADVICE r4: free-text notes left it ambiguous vs final_epoch)
    from tecogan_tpu.utils.checkpoint import load_flat

    ckpt_path = os.path.join(args.run_dir, "generator.ckpt")
    _, ckpt_meta = load_flat(ckpt_path)

    out = {
        "records": heldout["records"],
        "aggregate": heldout["aggregate"],
        "validation_psnr_trajectory_db": traj,
        "heldout_bicubic4x": anchors,
        "context": {
            "run_dir": args.run_dir,
            "scored_checkpoint": ckpt_path,
            "scored_checkpoint_epoch": int(ckpt_meta.get("epoch", -1)),
            "final_epoch": int(last.get("epoch", -1)) + 1,
            "final_step": int(last.get("step", -1)),
            "train_wall_s": round(float(last.get("wall_time", 0.0)), 1),
            "median_ms_per_step_wall": (round(ms_per_step, 1)
                                        if ms_per_step else None),
            "train_mfu_wall": (round(train_mfu, 4) if train_mfu else None),
            "train_tflop_per_step": args.train_tflop_per_step,
            "protocol": (
                "unified train/eval degradation; LR and HR each "
                "bilinear-resized from the source frame; "
                f"{args.limit_frames} frames/clip; eval scenes "
                f"{args.eval_scenes} held out from training"),
            "note": args.context_note,
        },
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
