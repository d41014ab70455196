#!/usr/bin/env python
"""AOT-export the recurrent inference programs for serving.

Serializes the two compiled window programs of the chunked inference
path (engine/inference.py build_chunked_inference: ``head_fn`` for the
cold-start window, ``cont_fn`` for continuation windows) as portable
StableHLO artifacts via ``jax.export``.  A serving host can then run
long-clip 4x VSR by deserializing the two programs and driving the
window loop — no model code, flax, or weights-plumbing needed beyond
the params pytree itself.

The reference has no deployment story beyond "run main.py --mode
inference" (reference main.py:173-220); this is the TPU-native
equivalent of shipping a TorchScript/ONNX export.

Usage:
  python tools/export_infer.py --out /tmp/export --height 270 --width 480 \
      [--batch 1] [--chunk 16] [--g_checkpoint ckpt] [--check]

Artifacts: <out>/head.stablehlo, <out>/cont.stablehlo, <out>/manifest.json.
--check deserializes both and asserts bit-equality against the live
programs on random inputs (and prints a tiny latency sanity number).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.engine.inference import build_chunked_inference
from tecogan_tpu.engine.state import model_defs


def _spec_tree(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tree
    )


def _manifest_spec(tree):
    leaves, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {
        jax.tree_util.keystr(p): [list(map(int, l.shape)), str(l.dtype)]
        for p, l in leaves
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--g_checkpoint", default=None,
                    help="generator .ckpt (ours or converted torch); "
                    "random init if omitted (export is weight-agnostic)")
    ap.add_argument("--height", type=int, default=270)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--chunk", type=int, default=16,
                    help="frames per compiled window")
    ap.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--num_resblock", type=int, default=16)
    ap.add_argument("--check", action="store_true",
                    help="deserialize and assert bit-equality vs live")
    ap.add_argument("--wire", default="f32", choices=["f32", "u8"],
                    help="u8: export the transfer-thrifty serving "
                    "specialization — LR windows arrive uint8 (device "
                    "dequant x*f32(1/255), transfer_quantize_u8 "
                    "contract) and SR windows leave uint8 (device "
                    "clip(x*255).astype(u8), bit-equal to host "
                    "to_uint8) — 4x fewer bytes each way")
    ap.add_argument("--quantize", default="none", choices=["none", "int8"],
                    help="int8: also export head_q/cont_q window programs "
                    "with the W8A8 generator tail, plus the calibrated "
                    "qtail values (qtail.npz) so the artifact is "
                    "self-contained")
    ap.add_argument("--calib_dir", default=None,
                    help="directory of frames (pngs) to calibrate int8 "
                    "activation scales on; synthetic moving scene if "
                    "omitted (prefer real serving content)")
    args = ap.parse_args()

    cfg = TecoConfig(precision=args.precision, num_resblock=args.num_resblock,
                     bug_parity=False)
    gen, _ = model_defs(cfg)
    params_g = gen.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 51), jnp.float32),
    )["params"]
    if args.g_checkpoint:
        from tecogan_tpu.utils.checkpoint import load_generator_params

        params_g = load_generator_params(args.g_checkpoint, params_g)

    wire_u8 = args.wire == "u8"
    infer = build_chunked_inference(cfg, gen, out_u8=wire_u8)
    B, K, H, W = args.batch, args.chunk, args.height, args.width
    params_spec = _spec_tree(params_g)
    lr_spec = jax.ShapeDtypeStruct(
        (B, K, H, W, 3), jnp.uint8 if wire_u8 else jnp.float32)

    carry_spec, sr_spec = jax.eval_shape(infer.head_fn, params_spec, lr_spec)
    head_exp = jax_export.export(infer.head_fn)(params_spec, lr_spec)
    cont_exp = jax_export.export(infer.cont_fn)(params_spec, carry_spec,
                                                lr_spec)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "head.stablehlo"), "wb") as f:
        f.write(head_exp.serialize())
    with open(os.path.join(args.out, "cont.stablehlo"), "wb") as f:
        f.write(cont_exp.serialize())
    manifest = {
        "platforms": list(head_exp.platforms),
        "batch": B, "chunk": K, "height": H, "width": W,
        "precision": args.precision, "num_resblock": args.num_resblock,
        "wire": args.wire,
        "lr_window": [[B, K, H, W, 3], str(lr_spec.dtype)],
        "sr_window": [list(map(int, sr_spec.shape)), str(sr_spec.dtype)],
        "carry": _manifest_spec(carry_spec),
        "params": _manifest_spec(params_spec),
        "protocol": "head(params, lr_window) -> (carry, sr_window); "
                    "cont(params, carry, lr_window) -> (carry, sr_window); "
                    "pad the tail window with its last frame and trim."
                    + (" u8 wire: lr = rint(f32*255) on the client; sr "
                       "comes back uint8, write it as-is." if wire_u8
                       else ""),
    }
    qtail = None
    if args.quantize == "int8":
        from tecogan_tpu.engine.inference import (
            build_quantized_clip_inference,
        )

        if args.calib_dir:
            import cv2

            files = sorted(
                f for f in os.listdir(args.calib_dir)
                if f.lower().endswith((".png", ".jpg", ".jpeg"))
            )[:8]
            frames = [
                cv2.cvtColor(
                    cv2.imread(os.path.join(args.calib_dir, f)),
                    cv2.COLOR_BGR2RGB,
                ) for f in files
            ]
            calib = np.stack([
                cv2.resize(fr, (W, H), interpolation=cv2.INTER_AREA)
                for fr in frames
            ]).astype(np.float32) / 255.0
        else:
            from tecogan_tpu.data.synthetic import moving_rect_scene

            calib = moving_rect_scene(num_frames=8, height=H, width=W)
            print("int8: calibrating on a synthetic moving scene "
                  "(--calib_dir with real serving content preferred)")
        calib = jnp.asarray(np.broadcast_to(calib[None], (B,) + calib.shape))

        prepare, _ = build_quantized_clip_inference(cfg, gen)
        qtail = prepare(params_g, calib, frames=8)
        qtail_spec = _spec_tree(qtail)
        head_q = jax_export.export(infer.head_fn)(params_spec, lr_spec,
                                                  qtail_spec)
        cont_q = jax_export.export(infer.cont_fn)(params_spec, carry_spec,
                                                  lr_spec, qtail_spec)
        with open(os.path.join(args.out, "head_q.stablehlo"), "wb") as f:
            f.write(head_q.serialize())
        with open(os.path.join(args.out, "cont_q.stablehlo"), "wb") as f:
            f.write(cont_q.serialize())
        flat, _ = jax.tree_util.tree_flatten_with_path(qtail)
        np.savez(
            os.path.join(args.out, "qtail.npz"),
            **{jax.tree_util.keystr(p): np.asarray(l) for p, l in flat
               if l is not None},
        )
        manifest["qtail"] = _manifest_spec(
            jax.tree_util.tree_map(lambda x: x, qtail))
        manifest["protocol_q"] = (
            "head_q(params, lr_window, qtail) -> (carry, sr_window); "
            "cont_q(params, carry, lr_window, qtail) -> (carry, "
            "sr_window); qtail values in qtail.npz keyed by tree path "
            "(biases may be absent: second resblock convs have none)."
        )

    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    sizes = {n: os.path.getsize(os.path.join(args.out, n))
             for n in os.listdir(args.out) if n.endswith(".stablehlo")}
    print(f"exported to {args.out} ({sizes}, platforms={manifest['platforms']})")

    if args.check:
        rng = np.random.default_rng(0)
        if wire_u8:
            lr1 = jnp.asarray(
                rng.integers(0, 256, (B, K, H, W, 3), dtype=np.uint8))
            lr2 = jnp.asarray(
                rng.integers(0, 256, (B, K, H, W, 3), dtype=np.uint8))
        else:
            lr1 = jnp.asarray(rng.random((B, K, H, W, 3), np.float32))
            lr2 = jnp.asarray(rng.random((B, K, H, W, 3), np.float32))
        with open(os.path.join(args.out, "head.stablehlo"), "rb") as f:
            head_rt = jax_export.deserialize(f.read())
        with open(os.path.join(args.out, "cont.stablehlo"), "rb") as f:
            cont_rt = jax_export.deserialize(f.read())

        carry_l, sr1_l = infer.head_fn(params_g, lr1)
        carry_r, sr1_r = head_rt.call(params_g, lr1)
        np.testing.assert_array_equal(np.asarray(sr1_l), np.asarray(sr1_r))
        _, sr2_l = infer.cont_fn(params_g, carry_l, lr2)
        t0 = time.perf_counter()
        _, sr2_r = cont_rt.call(params_g, carry_r, lr2)
        jax.block_until_ready(sr2_r)
        dt = time.perf_counter() - t0
        np.testing.assert_array_equal(np.asarray(sr2_l), np.asarray(sr2_r))
        print(f"check ok: head+cont bit-equal vs live; cont window "
              f"({K} frames) {dt*1e3:.1f} ms cold")

        if qtail is not None:
            with open(os.path.join(args.out, "head_q.stablehlo"), "rb") as f:
                head_q_rt = jax_export.deserialize(f.read())
            with open(os.path.join(args.out, "cont_q.stablehlo"), "rb") as f:
                cont_q_rt = jax_export.deserialize(f.read())
            carry_l, sr1_l = infer.head_fn(params_g, lr1, qtail)
            carry_r, sr1_r = head_q_rt.call(params_g, lr1, qtail)
            np.testing.assert_array_equal(np.asarray(sr1_l), np.asarray(sr1_r))
            _, sr2_l = infer.cont_fn(params_g, carry_l, lr2, qtail)
            _, sr2_r = cont_q_rt.call(params_g, carry_r, lr2, qtail)
            np.testing.assert_array_equal(np.asarray(sr2_l), np.asarray(sr2_r))
            print("check ok: head_q+cont_q (int8 tail) bit-equal vs live")


if __name__ == "__main__":
    main()
