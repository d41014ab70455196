#!/usr/bin/env python
"""End-to-end CPU verification drive (.claude/skills/verify recipe):
synthetic dataset -> train steps -> checkpoint roundtrip -> inference
(scan == stream == chunked) -> media artifacts -> quantized path.

Run: PYTHONPATH="" JAX_PLATFORMS=cpu python tools/verify_drive.py
"""

import itertools
import os
import sys
import tempfile

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tecogan_tpu.config import TecoConfig  # noqa: E402
from tecogan_tpu.data.synthetic import write_synthetic_scene_folders  # noqa: E402
from tecogan_tpu.data.scenes import TrainDataset, InferenceDataset  # noqa: E402
from tecogan_tpu.engine.state import init_state  # noqa: E402
from tecogan_tpu.utils.checkpoint import (  # noqa: E402
    save_train_state, load_train_state,
)
from tecogan_tpu.engine.train import build_train_step  # noqa: E402
from tecogan_tpu.engine.inference import (  # noqa: E402
    build_clip_inference, build_stream_inference, build_chunked_inference,
    build_quantized_clip_inference,
)
from tecogan_tpu.ops.image import save_as_media  # noqa: E402


def main():
    tmp = tempfile.mkdtemp()
    scenes = os.path.join(tmp, "scenes")
    write_synthetic_scene_folders(scenes, num_scenes=2, size=64)
    cfg = TecoConfig(crop_size=8, RNN_N=9, num_resblock=2,
                     discrim_resblocks=1, discrim_channels=16, batch_size=2,
                     precision="fp32", input_video_dir=scenes,
                     str_dir=1000, end_dir=1001)
    ds = TrainDataset(cfg)
    step = build_train_step(cfg)
    state = init_state(cfg, jax.random.PRNGKey(0))

    def epochs():
        for e in itertools.count():
            yield from ds.batches(2, seed=e)

    it = epochs()
    losses = []
    for _ in range(5):
        lr, hr = next(it)
        state, m, _ = step(state, lr, hr)
        losses.append(float(m["gen_loss"]))
    print("gen_loss:", [round(x, 4) for x in losses])
    assert all(np.isfinite(losses)), losses

    ck = os.path.join(tmp, "ck")
    save_train_state(ck, state, epoch=3)
    st2, ep = load_train_state(ck, state)
    assert ep == 3
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(st2.params_g)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params_g)[0]))
    print("checkpoint roundtrip ok, epoch", ep)

    icfg = cfg.replace(input_dir_LR=scenes, crop_size=64)
    infer = build_clip_inference(icfg)
    ids = InferenceDataset(icfg)
    clip = ids.get_clip(0)[None][:, :12]
    sr = np.asarray(infer(state.params_g, clip))
    print("infer out:", sr.shape, sr.min(), sr.max())
    assert sr.shape == (1, clip.shape[1], 256, 256, 3)
    assert 0.0 <= sr.min() and sr.max() <= 1.0

    init_fn, step_fn = build_stream_inference(icfg)
    st = init_fn(clip[:, 0].shape)
    srs = []
    for t in range(clip.shape[1]):
        st, out = step_fn(state.params_g, st, clip[:, t])
        srs.append(np.asarray(out))
    sr_s = np.stack(srs, axis=1)
    print("stream maxdiff:", np.abs(sr_s - sr).max())
    assert np.abs(sr_s - sr).max() == 0.0

    chunk_infer = build_chunked_inference(icfg)
    sr_c = chunk_infer(state.params_g, clip, chunk=5)
    print("chunked maxdiff:", np.abs(np.asarray(sr_c) - sr).max())
    assert np.abs(np.asarray(sr_c) - sr).max() == 0.0

    qcfg = icfg.replace(bug_parity=False)
    sr_fast = np.asarray(build_clip_inference(qcfg)(state.params_g, clip))
    prepare, qinfer = build_quantized_clip_inference(qcfg)
    qtail = prepare(state.params_g, clip, frames=4)
    sr_q = np.asarray(qinfer(state.params_g, qtail, clip))
    mse = float(np.mean((sr_q - sr_fast) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    print(f"int8 vs bf16 PSNR: {psnr:.2f} dB")
    assert psnr > 35.0

    save_as_media(sr[0], os.path.join(tmp, "x.gif"))
    save_as_media(sr[0], os.path.join(tmp, "x.mp4"))
    sizes = {f: os.path.getsize(os.path.join(tmp, f))
             for f in os.listdir(tmp) if f.startswith("x.")}
    print("media:", sizes)
    assert all(v > 0 for v in sizes.values())

    # CLI surface with the int8 serving flag (reads the drive's checkpoint).
    # Short clips: XLA CPU lowers s8 convs naively (fine — the int8 path
    # is TPU serving), so 120-frame scenes would dominate the drive.
    from tecogan_tpu.cli.main import main as cli_main

    scenes12 = os.path.join(tmp, "scenes12")
    write_synthetic_scene_folders(scenes12, num_scenes=1, size=64,
                                  frames_per_scene=12)
    out_q = os.path.join(tmp, "q")
    cli_main([
        "--mode", "inference", "--inferencetype", "dataset",
        "--input_dir_LR", scenes12, "--input_dir_len", "1",
        "--crop_size", "32", "--num_resblock", "2",
        "--bug_parity", "False", "--quantize", "int8",
        "--g_checkpoint", os.path.join(ck, "generator.ckpt"),
        "--output_dir", out_q, "--data_axis", "1",
        # force the chunked route so the drive covers STREAMED int8
        "--infer_chunk", "5",
    ])
    outs = os.listdir(out_q)
    print("cli int8 inference:", outs)
    assert outs and all(os.path.getsize(os.path.join(out_q, f)) > 0
                        for f in outs)
    print("VERIFY OK")


if __name__ == "__main__":
    main()
