"""Live streaming SR demo (reference experimental/live.py rebuilt).

Captures webcam (or any cv2 source / synthetic fallback) frames and runs
the streaming recurrent SR path with an O(1) on-device carried state —
unlike the reference, the state never leaves the device and there is no
10-frame buffering latency (experimental/live.py:85 buffers 10 frames
before showing anything; here each frame is upscaled as it arrives).

Usage:
  python -m tecogan_tpu.cli.live --g_checkpoint <ckpt> [--source 0]
      [--crop_size 128] [--display/--no-display] [--frames N]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--g_checkpoint", required=True)
    p.add_argument("--source", default="0",
                   help="cv2 source index/path, or 'synthetic'")
    p.add_argument("--crop_size", type=int, default=128)
    p.add_argument("--num_resblock", type=int, default=16)
    p.add_argument("--frames", type=int, default=-1,
                   help="stop after N frames (-1: until q/EOF)")
    p.add_argument("--display", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--fast", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="fused s2d fast path (the 38-fps production "
                        "pipeline); --no-fast keeps the exact "
                        "reference-shaped per-frame math")
    p.add_argument("--output", default="",
                   help="optional mp4 path to record the SR stream")
    args = p.parse_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp

    from ..config import TecoConfig
    from ..engine import build_stream_inference, init_state
    from ..utils.checkpoint import load_generator_params
    from ..ops.image import to_uint8

    cfg = TecoConfig(crop_size=args.crop_size, num_resblock=args.num_resblock,
                     bug_parity=not args.fast)
    state0 = init_state(cfg, jax.random.PRNGKey(0))
    params_g = load_generator_params(args.g_checkpoint, state0.params_g)
    init_fn, step_fn = build_stream_inference(cfg)

    if args.source == "synthetic":
        from ..data.synthetic import moving_rect_scene

        frames_src = moving_rect_scene(
            max(args.frames, 60), args.crop_size, args.crop_size
        )
        reader = iter(frames_src)

        def read():
            return next(reader, None)
    else:
        # int index, file path, or a synth:class=chess:... procedural spec
        # with silent fallback (data/capture.py — reference
        # data/video.py:172-206 semantics)
        from ..data.capture import create_capture

        cap = create_capture(args.source)

        def read():
            ok, frame = cap.read()
            if not ok:
                return None
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            frame = cv2.resize(
                frame, (args.crop_size, args.crop_size),
                interpolation=cv2.INTER_AREA,
            )
            return frame.astype(np.float32) / 255.0

    writer = None
    state = init_fn((1, args.crop_size, args.crop_size, 3))
    n, t0 = 0, time.time()
    while args.frames < 0 or n < args.frames:
        frame = read()
        if frame is None:
            break
        state, sr = step_fn(params_g, state, jnp.asarray(frame)[None])
        sr_u8 = to_uint8(np.asarray(sr[0]))
        if args.output:
            if writer is None:
                h, w = sr_u8.shape[:2]
                writer = cv2.VideoWriter(
                    args.output, cv2.VideoWriter_fourcc(*"mp4v"), 24, (w, h)
                )
            writer.write(cv2.cvtColor(sr_u8, cv2.COLOR_RGB2BGR))
        if args.display:
            cv2.imshow("TecoGAN-TPU live", cv2.cvtColor(sr_u8, cv2.COLOR_RGB2BGR))
            if cv2.waitKey(1) & 0xFF == ord("q"):
                break
        n += 1
    dt = time.time() - t0
    if writer is not None:
        writer.release()
    print(f"{n} frames in {dt:.2f}s ({n / max(dt, 1e-9):.1f} fps)")


if __name__ == "__main__":
    main()
