#!/usr/bin/env python3
"""A/B the int8 (W8A8) quantized tail against the bf16 fast path on the
270p -> 1080p recurrent inference benchmark (same harness as bench.py),
plus the quantization-quality delta (int8 vs bf16 output PSNR).

Usage: python tools/bench_quant.py [--g_checkpoint ckpt] [--frames 32]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.engine import init_state
    from tecogan_tpu.engine.inference import (
        build_clip_inference, build_quantized_clip_inference,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--g_checkpoint", default=None)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--height", type=int, default=270)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    H, W, T = args.height, args.width, args.frames
    cfg = TecoConfig(precision="bf16", num_resblock=16, bug_parity=False)
    state = init_state(cfg.replace(crop_size=8), jax.random.PRNGKey(0))
    params_g = state.params_g
    if args.g_checkpoint:
        from tecogan_tpu.utils.checkpoint import load_generator_params

        params_g = load_generator_params(args.g_checkpoint, params_g)

    rng = np.random.default_rng(0)
    clip = jnp.asarray(rng.random((1, T, H, W, 3), np.float32))

    def timed(fn, *fargs):
        out = fn(*fargs)
        _ = float(jnp.sum(out[:, -1, ::271]))  # drain the remote queue
        t0 = time.time()
        for _ in range(args.reps):
            out = fn(*fargs)
        _ = float(jnp.sum(out[:, -1, ::271]))
        return out, T / ((time.time() - t0) / args.reps)

    infer_bf16 = build_clip_inference(cfg)
    sr_bf16, fps_bf16 = timed(infer_bf16, params_g, clip)

    prepare, infer_q = build_quantized_clip_inference(cfg)
    qtail = prepare(params_g, clip, frames=8)
    sr_q, fps_q = timed(infer_q, params_g, qtail, clip)

    mse = float(np.mean((np.asarray(sr_q) - np.asarray(sr_bf16)) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    print(json.dumps({
        "metric": "int8_vs_bf16_270p_to_1080p",
        "fps_bf16": round(fps_bf16, 2),
        "fps_int8": round(fps_q, 2),
        "speedup": round(fps_q / fps_bf16, 3),
        "int8_vs_bf16_psnr_db": round(psnr, 2),
        "checkpoint": args.g_checkpoint or "random-init",
    }))


if __name__ == "__main__":
    main()
