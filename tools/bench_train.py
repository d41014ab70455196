#!/usr/bin/env python3
"""Training-throughput benchmark (reference config: batch 4, crop 32,
RNN_N 10, 16 resblocks — main.py:79-113,227).

Prints one JSON line per mode: ms/step and steps/s for the reference-exact
(bug_parity) step and the fixed-semantics full-BPTT step.

The reference trains this config at ~300 ms/step on an RTX 2080
(README.md:21: 37.7 s/epoch fp32 over ~102 batches -> ~370 ms; fp16
~300 ms).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.engine import init_state, build_train_step

    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.random((4, 10, 3, 32, 32), np.float32))
    hr = jnp.asarray(rng.random((4, 10, 3, 128, 128), np.float32))

    for name, kw in (
        ("train_parity", dict(bug_parity=True)),
        ("train_fixed_bptt", dict(bug_parity=False)),
        ("train_fixed_bptt_bf16", dict(bug_parity=False, precision="bf16")),
    ):
        cfg = TecoConfig(crop_size=32, RNN_N=10, num_resblock=16,
                         batch_size=4, precision=kw.pop("precision", "fp32"), **kw)
        state = init_state(cfg, jax.random.PRNGKey(0))
        step = build_train_step(cfg, donate=False)
        state, metrics, _ = step(state, lr, hr)
        _ = float(metrics["gen_loss"])  # drain queue through the tunnel
        reps = int(os.environ.get("BENCH_TRAIN_REPS", "5"))
        t0 = time.time()
        for _ in range(reps):
            state, metrics, _ = step(state, lr, hr)
        _ = float(metrics["gen_loss"])
        dt = (time.time() - t0) / reps
        from tecogan_tpu.utils.flops import train_mfu

        acc = train_mfu(1000 * dt, 4, 10, 32, cfg.num_resblock,
                        cfg.discrim_resblocks, cfg.discrim_channels,
                        pingpang=cfg.pingpang, bug_parity=cfg.bug_parity)
        print(json.dumps({
            "metric": name, "value": round(1000 * dt, 1), "unit": "ms/step",
            "steps_per_s": round(1.0 / dt, 2),
            "train_tflop_per_step": round(acc["train_tflop_per_step"], 3),
            "achieved_tflops": round(acc["achieved_tflops"], 1),
            "mfu": round(acc["mfu"], 3),
        }), flush=True)


if __name__ == "__main__":
    main()
