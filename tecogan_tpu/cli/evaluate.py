"""Quality evaluation harness (new capability — the reference computes no
metrics at all: compute_psnr exists but is never called, code/ops.py:130-139;
BASELINE.md requires PSNR within 0.1 dB and LPIPS parity).

Modes:
  * --sr_dir vs --hr_dir: per-frame PSNR/SSIM (+ VGG perceptual distance if
    --vgg_ckpt given) between two frame folders or two media files.
  * --g_checkpoint + --input_dir_HR: run the model on LR-downscaled HR
    scenes and score SR against the original HR (the standard VSR eval).

Outputs one JSON line per clip plus an aggregate line.

Usage:
  python -m tecogan_tpu.cli.evaluate --g_checkpoint g.ckpt \
      --input_dir_HR <scene_root> [--crop_size 64] [--limit_frames 40]
  python -m tecogan_tpu.cli.evaluate --sr_dir out/ --hr_dir gt/
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _load_frames(path: str) -> np.ndarray:
    """Load a media file or a directory of frames -> (T, H, W, 3) [0,1]."""
    import cv2

    if os.path.isdir(path):
        from ..data.scenes import _load_png

        names = sorted(os.listdir(path))
        return np.stack([_load_png(os.path.join(path, n)) for n in names])
    if path.lower().endswith(".gif"):
        import imageio

        frames = imageio.mimread(path)
        return np.stack([np.asarray(f)[..., :3] for f in frames]).astype(np.float32) / 255.0
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0)
    cap.release()
    return np.stack(frames)


def score_pair(sr: np.ndarray, hr: np.ndarray, vgg_params=None,
               lpips_lin=None) -> dict:
    import jax.numpy as jnp

    from ..ops.metrics import (
        psnr, psnr_per_frame, ssim, vgg_perceptual_distance, lpips_distance,
    )

    T = min(len(sr), len(hr))
    sr, hr = jnp.asarray(sr[:T]), jnp.asarray(hr[:T])
    per_frame = psnr_per_frame(hr, sr)
    out = {
        "frames": int(T),
        # headline: mean of per-frame PSNR (the standard VSR convention);
        # pooled-MSE PSNR kept for comparability with older runs
        "psnr_db": float(jnp.mean(per_frame)),
        "psnr_global_db": float(psnr(hr, sr)),
        "ssim": float(ssim(sr, hr)),
    }
    if vgg_params is not None:
        from ..models.vgg import vgg19_features

        layers = ("vgg_19/conv2_2", "vgg_19/conv3_4", "vgg_19/conv4_4")
        fx = vgg19_features(vgg_params, sr, deep_list=layers)
        fy = vgg19_features(vgg_params, hr, deep_list=layers)
        out["vgg_dist"] = float(vgg_perceptual_distance(fx, fy, layers))
        # the real LPIPS architecture; the published metric additionally
        # needs the learned per-channel linear weights (--lpips_lin npz of
        # layer->weights).  Without them (none available offline) the
        # uniform-weight result is honestly named lpips_surrogate.
        key = "lpips" if lpips_lin else "lpips_surrogate"
        out[key] = float(lpips_distance(fx, fy, layers, lin_weights=lpips_lin))
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sr_dir", default=None)
    p.add_argument("--hr_dir", default=None)
    p.add_argument("--g_checkpoint", default=None)
    p.add_argument("--input_dir_HR", default=None)
    p.add_argument("--crop_size", type=int, default=64,
                   help="LR size for model eval (HR = 4x)")
    p.add_argument("--num_resblock", type=int, default=16)
    p.add_argument("--limit_frames", type=int, default=-1)
    p.add_argument("--limit_clips", type=int, default=-1)
    p.add_argument("--degradation", choices=["bilinear", "area"],
                   default="bilinear",
                   help="LR-generation kernel for model eval. Default "
                        "bilinear matches the TRAINING pairing "
                        "(data/scenes.py; reference dataloader.py:86-95 "
                        "uses torchvision bilinear) so held-out scores "
                        "measure the trained degradation, not a kernel "
                        "mismatch. 'area' keeps the pre-r3 INTER_AREA "
                        "kernel, but NOT the exact pre-r3 LR chain: LR "
                        "now resizes the SOURCE frame (pre-r3 resized "
                        "the already-resized HR stack), so scores are "
                        "not directly comparable to synthetic_eval_r2.")
    p.add_argument("--vgg_ckpt", default=None,
                   help="converted VGG-19 .ckpt, or 'surrogate' for "
                        "fixed-seed random-feature weights")
    p.add_argument("--lpips_lin", default=None,
                   help="npz of layer-name -> per-channel LPIPS linear "
                        "weights; without it lpips is reported as "
                        "lpips_surrogate (uniform weights)")
    p.add_argument("--json_out", default=None,
                   help="also write all records to this JSON file")
    p.add_argument("--bug_parity", default=True, type=lambda v: v in ("1", "true", "True"))
    args = p.parse_args(argv)

    vgg_params = None
    if args.vgg_ckpt:
        from ..models.vgg import load_vgg_params

        vgg_params = load_vgg_params(args.vgg_ckpt)
    lpips_lin = None
    if args.lpips_lin:
        z = np.load(args.lpips_lin)
        lpips_lin = {k: z[k] for k in z.files}

    results = []

    if args.sr_dir and args.hr_dir:
        sr = _load_frames(args.sr_dir)
        hr = _load_frames(args.hr_dir)
        if args.limit_frames > 0:
            sr, hr = sr[: args.limit_frames], hr[: args.limit_frames]
        if sr.shape[1:3] != hr.shape[1:3]:
            import cv2

            hr = np.stack(
                [cv2.resize(f, (sr.shape[2], sr.shape[1])) for f in hr]
            )
        rec = {"clip": "pair", **score_pair(sr, hr, vgg_params, lpips_lin)}
        print(json.dumps(rec))
        results.append(rec)
    elif args.g_checkpoint and args.input_dir_HR:
        import cv2
        import jax
        import jax.numpy as jnp

        from ..config import TecoConfig
        from ..engine import build_clip_inference
        from ..engine.state import model_defs
        from ..utils.checkpoint import load_generator_params

        cfg = TecoConfig(
            crop_size=args.crop_size, num_resblock=args.num_resblock,
            bug_parity=args.bug_parity,
        )
        # only a generator params TEMPLATE is needed to type the load —
        # init the generator alone, not a full TrainState (no D, no
        # optimizer states) at inference time
        gen, _ = model_defs(cfg)
        template = gen.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 51), jnp.float32)
        )["params"]
        params_g = load_generator_params(args.g_checkpoint, template)
        infer = build_clip_inference(cfg)

        clips = sorted(os.listdir(args.input_dir_HR))
        if args.limit_clips > 0:
            clips = clips[: args.limit_clips]
        for name in clips:
            hr = _load_frames(os.path.join(args.input_dir_HR, name))
            if args.limit_frames > 0:
                hr = hr[: args.limit_frames]
            hr_size = args.crop_size * 4
            interp = (cv2.INTER_LINEAR if args.degradation == "bilinear"
                      else cv2.INTER_AREA)
            src = hr  # original decoded frames
            # LR and HR each resize the SOURCE frame independently — the
            # training pairing (data/scenes.py; dataloader.py:86-95), not
            # LR-from-HR re-degradation
            hr = np.stack([cv2.resize(f, (hr_size, hr_size)) for f in src])
            lr = np.stack(
                [cv2.resize(f, (args.crop_size, args.crop_size),
                            interpolation=interp) for f in src]
            )
            sr = np.asarray(infer(params_g, jnp.asarray(lr)[None])[0])
            rec = {"clip": name, **score_pair(sr, hr, vgg_params, lpips_lin)}
            print(json.dumps(rec))
            results.append(rec)
    else:
        raise SystemExit(
            "need either (--sr_dir and --hr_dir) or "
            "(--g_checkpoint and --input_dir_HR)"
        )

    if not results:
        raise SystemExit("no clips scored (check --input_dir_HR contents)")
    agg = {"clip": "__aggregate__", "clips": len(results)}
    for key in ("psnr_db", "psnr_global_db", "ssim", "vgg_dist",
                "lpips", "lpips_surrogate"):
        if all(key in r for r in results):
            agg[key] = float(np.mean([r[key] for r in results]))
    print(json.dumps(agg))
    if args.json_out:
        os.makedirs(os.path.dirname(os.path.abspath(args.json_out)),
                    exist_ok=True)
        with open(args.json_out, "w") as f:
            json.dump({"records": results, "aggregate": agg}, f, indent=1)


if __name__ == "__main__":
    main()
