#!/usr/bin/env python3
"""On-chip measurement of the conv_out formulations (VERDICT r4 item 3).

Compares the direct XLA chain (3x3 conv at 1080p + sigmoid + identity-s2d
conv), the phase formulation, and the fused Pallas kernel
(ops/pallas/conv_out_s2d.py) on the real TPU at the production shape
(B=1, 1080x1920, 64ch bf16): exactness first, then standalone timing.

Usage: python tools/measure_conv_out.py
Prints one JSON line per implementation.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, reps: int = 20):
    # NOTE: block_until_ready does NOT synchronize through the remote-TPU
    # tunnel (bench.py) — drain the queue with a scalar device->host fetch.
    import jax.numpy as jnp

    out = fn(*args)
    _ = float(jnp.sum(out[0, 0, :4]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(out[0, 0, :4]))
    return out, (time.perf_counter() - t0) / reps * 1000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tecogan_tpu.engine import fused
    from tecogan_tpu.ops.pallas.conv_out_s2d import (
        conv_out_s2d_pallas, conv_out_s2d_pallas_paired)

    backend = jax.default_backend()
    H4, W4 = 1080, 1920
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((1, H4, W4, 64), np.float32),
                       jnp.bfloat16)
    kernel = jnp.asarray(rng.standard_normal((3, 3, 64, 3), np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((3,), np.float32) * 0.1)

    def direct(f):
        C = kernel.shape[-1]
        y = jax.lax.conv_general_dilated(
            f, kernel.astype(f.dtype), (1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        frame = jax.nn.sigmoid((y + bias.astype(y.dtype)).astype(jnp.bfloat16))
        return jax.lax.conv_general_dilated(
            frame, fused._s2d_identity_kernel(frame.dtype, 4, C), (4, 4),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def phase(f):
        from tecogan_tpu.engine.attic import conv_out_s2d_phase
        return conv_out_s2d_phase(f, kernel, bias, jnp.bfloat16)

    def pallas(f):
        return conv_out_s2d_pallas(f, kernel, bias, out_dtype=jnp.bfloat16,
                                   interpret=backend != "tpu")

    def paired(f):
        return conv_out_s2d_pallas_paired(
            f, kernel, bias, out_dtype=jnp.bfloat16,
            interpret=backend != "tpu")

    impls = {"direct": jax.jit(direct), "phase": jax.jit(phase),
             "pallas": pallas, "paired": paired}
    ref, t_ref = bench(impls["direct"], feat)
    results = {}
    for name, fn in impls.items():
        try:
            out, ms = bench(fn, feat, reps=5 if backend != "tpu" else 20)
            maxdiff = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                            - ref.astype(jnp.float32))))
            results[name] = (ms, maxdiff)
            print(json.dumps({"impl": name, "ms_per_frame": round(ms, 3),
                              "maxdiff_vs_direct": maxdiff,
                              "backend": backend}), flush=True)
        except Exception as e:  # record the failure, keep measuring
            print(json.dumps({"impl": name, "error": repr(e)[:300],
                              "backend": backend}), flush=True)
    if "pallas" in results and "direct" in results:
        print(json.dumps({
            "summary": "pallas_vs_direct",
            "speedup": round(results["direct"][0] / results["pallas"][0], 3),
            "exact": results["pallas"][1] < 1e-2,
        }), flush=True)


if __name__ == "__main__":
    main()
