#!/usr/bin/env python3
"""Per-stage timing of the fused inference pipeline at several batch sizes.

CAVEAT (measured): through the remote-TPU tunnel, per-call dispatch
latency (~300 ms) swamps every stage when ops are timed as separate jit
calls — the numbers from this tool are only meaningful on a LOCAL
device.  For tunnel setups use tools/profile_scan_variants.py, which
times whole-clip scan variants with stages stubbed (differences isolate
per-stage in-context cost)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    # drain through a host fetch (remote tunnel)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    return (time.time() - t0) / reps * 1000


def main():
    import jax
    import jax.numpy as jnp

    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.engine import init_state
    from tecogan_tpu.engine.state import model_defs
    from tecogan_tpu.engine import fused as F
    from tecogan_tpu.models.generator import Generator
    import dataclasses

    H, W = 270, 480
    cfg = TecoConfig(precision="bf16", num_resblock=16, bug_parity=False)
    state = init_state(cfg.replace(crop_size=8), jax.random.PRNGKey(0))
    params_g = state.params_g
    gen, _ = model_defs(cfg)
    gen = dataclasses.replace(gen, out_dtype=jnp.bfloat16)
    variables = {"params": params_g}


    rng = np.random.default_rng(0)
    for B in [int(a) for a in sys.argv[1:]] or [1, 2]:
        prev_lr = jnp.asarray(rng.random((B, H, W, 3), np.float32))
        cur_lr = jnp.asarray(rng.random((B, H, W, 3), np.float32))
        carry = jnp.asarray(
            rng.random((B, H, W, 48), np.float32), dtype=jnp.bfloat16
        )

        coords = jax.jit(F.planar_pseudo_flow_coords)
        ix, iy = coords(prev_lr)
        t_coords = timeit(coords, prev_lr)

        tab = jax.jit(F.build_packed_table_s2d)
        table = tab(carry)
        t_table = timeit(tab, carry)

        comb = jax.jit(
            lambda t, x, y: F._packed_gather_combine(t, x, y, 4 * H, 4 * W, 4, 3)
        )
        warped = comb(table, ix, iy)
        t_comb = timeit(comb, table, ix, iy)

        first = jax.jit(
            lambda w, c: F.fused_first_layer(params_g, c, w, dtype=gen.dtype)
        )
        net = first(warped, cur_lr)
        t_first = timeit(first, warped, cur_lr)

        tailf = jax.jit(
            lambda n: gen.apply(variables, n, method=Generator.tail_features)
        )
        feat = tailf(net)
        t_tail = timeit(tailf, net, reps=5)

        cout = jax.jit(lambda f: F.conv_out_s2d(
            f, params_g["conv_out"]["kernel"], params_g["conv_out"]["bias"]))
        _ = cout(feat)
        t_out = timeit(cout, feat, reps=5)

        total = t_coords + t_table + t_comb + t_first + t_tail + t_out
        print(
            f"B={B}: coords {t_coords:.1f}  table {t_table:.1f}  "
            f"gather+combine {t_comb:.1f}  first {t_first:.1f}  "
            f"tail {t_tail:.1f}  conv_out {t_out:.1f}  | sum {total:.1f} ms"
            f"  ({total / B:.1f} ms/frame/stream)",
            flush=True,
        )


if __name__ == "__main__":
    main()
