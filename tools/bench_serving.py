#!/usr/bin/env python3
"""Batched multi-stream serving benchmark: aggregate fps for B concurrent
270p->1080p recurrent streams on one chip (the reference serves exactly one
stream, main.py:142-144 DataLoader(batch_size=1)).

Usage: python tools/bench_serving.py [B ...]   (default: 1 2 4)
Prints one JSON line per batch size.
"""

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
    from tecogan_tpu.engine.inference import build_clip_inference

    batches = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    H, W = 270, 480
    T = int(os.environ.get("BENCH_FRAMES", "32"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    cfg = TecoConfig(precision="bf16", num_resblock=16, bug_parity=False)
    state = init_state(cfg.replace(crop_size=8), jax.random.PRNGKey(0))
    params_g = state.params_g
    infer = build_clip_inference(cfg)
    rng = np.random.default_rng(0)

    for B in batches:
        # keep the live f32 output (B*T*1080p*3*4B = 0.8GB * B) bounded:
        # fewer frames at higher B, same aggregate work
        Tb = max(8, T // B)
        clip = jnp.asarray(rng.random((B, Tb, H, W, 3), np.float32))
        out = infer(params_g, clip)  # compile + warm
        _ = float(jnp.sum(out[:, -1, ::271]))
        del out
        t0 = time.time()
        for _ in range(reps):
            out = infer(params_g, clip)
        _ = float(jnp.sum(out[:, -1, ::271]))  # queue drain
        dt = (time.time() - t0) / reps
        del out, clip
        print(
            json.dumps(
                {
                    "metric": "serving_aggregate_fps",
                    "batch": B,
                    "frames": Tb,
                    "value": round(B * Tb / dt, 2),
                    "unit": "fps/chip",
                    "per_stream_ms_per_frame": round(dt / Tb * 1000, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
