#!/usr/bin/env python3
"""Headline benchmark: recurrent 4x VSR inference throughput, 270p -> 1080p
(BASELINE.md target: > 30 fps/chip on TPU v5e).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "fps/chip", "vs_baseline": N}

The measured program is the full recurrent pipeline per frame — pseudo-flow
upsample, warp of the previous 1080p SR frame, space-to-depth feedback,
generator forward — as one jitted lax.scan with the carried state
on-device (engine/inference.py), bf16 compute.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 30.0  # BASELINE.md: >30 fps/chip 270p->1080p on v5e


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.engine import init_state
    from tecogan_tpu.engine.inference import build_clip_inference

    # 270p -> 1080p: LR 480x270, 4x -> 1920x1080.
    H, W = 270, 480
    T = int(os.environ.get("BENCH_FRAMES", "32"))

    cfg = TecoConfig(precision="bf16", num_resblock=16, bug_parity=False)
    # crop_size only drives init shapes; inference is shape-polymorphic.
    state = init_state(cfg.replace(crop_size=8), jax.random.PRNGKey(0))
    params_g = state.params_g

    infer = build_clip_inference(cfg)

    rng = np.random.default_rng(0)
    clip = jnp.asarray(rng.random((1, T, H, W, 3), np.float32))

    # compile + warm at the SAME shape as the timed run; force a scalar
    # device->host fetch to drain the execution queue (block_until_ready
    # alone does not synchronize through the remote-TPU tunnel).
    out = infer(params_g, clip)
    _ = float(jnp.sum(out[:, -1, ::271]))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    t0 = time.time()
    for _ in range(reps):
        out = infer(params_g, clip)
    _ = float(jnp.sum(out[:, -1, ::271]))  # queue drain
    dt = (time.time() - t0) / reps
    fps = T / dt

    assert out.shape == (1, T, 1080, 1920, 3), out.shape

    # MFU accounting (VERDICT r2 Missing #5): analytic generator FLOPs
    # (utils/flops.py — useful MACs, transposed convs at input-pixel
    # granularity) against the v5e 197 TFLOP/s bf16 peak.
    from tecogan_tpu.utils.flops import inference_mfu

    acc = inference_mfu(fps, H, W, cfg.num_resblock)

    record = {
        "metric": "recurrent_4x_vsr_inference_270p_to_1080p",
        "value": round(fps, 2),
        "unit": "fps/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "gen_tflop_per_frame": round(acc["gen_tflop_per_frame"], 3),
        "achieved_tflops": round(acc["achieved_tflops"], 1),
        "mfu": round(acc["mfu"], 3),
    }

    # Secondary: the int8 W8A8 production serving path (CLI --quantize
    # int8; -0.01 dB vs ground truth on real content, eval/real_eval_r3
    # .json).  Headline `value` stays the exact bf16 path; these keys
    # record the faster serving configuration.  Best-effort: never let
    # the quantized run fail the headline bench.
    if os.environ.get("BENCH_INT8", "1") != "0":
        try:
            from tecogan_tpu.engine.inference import (
                build_quantized_clip_inference,
            )

            prepare, infer_q = build_quantized_clip_inference(cfg)
            qtail = prepare(params_g, clip, frames=8)
            out = infer_q(params_g, qtail, clip)
            assert out.shape == (1, T, 1080, 1920, 3), out.shape
            _ = float(jnp.sum(out[:, -1, ::271]))
            t0 = time.time()
            for _ in range(reps):
                out = infer_q(params_g, qtail, clip)
            _ = float(jnp.sum(out[:, -1, ::271]))
            fps_q = T / ((time.time() - t0) / reps)
            record["fps_int8_serving"] = round(fps_q, 2)
            record["int8_speedup"] = round(fps_q / fps, 3)
        except Exception as exc:  # pragma: no cover - tunnel flakiness
            import traceback

            traceback.print_exc(file=sys.stderr)
            tb = traceback.extract_tb(exc.__traceback__)
            where = f" @ {tb[-1].filename.rsplit('/', 1)[-1]}:{tb[-1].lineno}" if tb else ""
            record["fps_int8_serving_error"] = (
                f"{type(exc).__name__}: {exc}"[:120] + where
            )

    print(json.dumps(record))


if __name__ == "__main__":
    main()
