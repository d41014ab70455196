#!/usr/bin/env python3
"""Batch/crop scaling experiment for the convergence config (VERDICT r4
items 1 and 7): at 5.7% train MFU the chip is mostly idle, so raising
batch (and/or crop) should buy nearly-free samples/sec.  Measures the
EXACT convergence-run step (fixed semantics, bf16, ping-pong, VGG-19
surrogate perceptual loss) across batch sizes.

Usage: python tools/bench_train_scaling.py [--crop 32] [--batches 4 8 16 32]
Prints one JSON line per config with ms/step, samples/sec, and train MFU.
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
    from tecogan_tpu.engine import init_state, build_train_step
    from tecogan_tpu.models.vgg import vgg19_features, load_vgg_params
    from tecogan_tpu.utils.flops import train_step_macs

    p = argparse.ArgumentParser()
    p.add_argument("--crop", type=int, default=32)
    p.add_argument("--batches", type=int, nargs="+", default=[4, 8, 16, 32])
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    vgg_params = load_vgg_params("surrogate")

    def vgg_apply(images01_nhwc, deep_list):
        return vgg19_features(vgg_params, images01_nhwc, deep_list)

    rng = np.random.default_rng(0)
    for B in args.batches:
        cfg = TecoConfig(crop_size=args.crop, RNN_N=10, num_resblock=16,
                         batch_size=B, precision="bf16", bug_parity=False,
                         pingpang=True, vgg_scaling=0.2,
                         vgg_ckpt="surrogate")
        lr = jnp.asarray(rng.random((B, 10, 3, args.crop, args.crop),
                                    np.float32))
        hr = jnp.asarray(rng.random((B, 10, 3, args.crop * 4, args.crop * 4),
                                    np.float32))
        try:
            state = init_state(cfg, jax.random.PRNGKey(0))
            step = build_train_step(cfg, vgg_apply=vgg_apply, donate=False)
            state, metrics, _ = step(state, lr, hr)
            _ = float(metrics["gen_loss"])  # drain queue through the tunnel
            t0 = time.time()
            for _ in range(args.reps):
                state, metrics, _ = step(state, lr, hr)
            _ = float(metrics["gen_loss"])
            dt = (time.time() - t0) / args.reps
        except Exception as e:
            print(json.dumps({"batch": B, "crop": args.crop,
                              "error": repr(e)[:200]}), flush=True)
            continue
        tf_step = train_step_macs(
            B, 10, args.crop, num_resblock=16, pingpang=True,
            bug_parity=False) * 2 / 1e12
        print(json.dumps({
            "metric": "train_step_convergence_cfg",
            "batch": B, "crop": args.crop,
            "ms_per_step": round(dt * 1000, 1),
            "samples_per_sec": round(B / dt, 2),
            "train_tflop_per_step": round(tf_step, 3),
            "train_mfu": round(tf_step / dt / 197.0, 4),
        }), flush=True)
        del state, step, lr, hr


if __name__ == "__main__":
    main()
