"""Configuration for the TecoGAN-TPU framework.

The public flag surface reproduces the reference CLI exactly (names, defaults,
help text semantics: /root/reference/main.py:33-127) on top of a typed
dataclass, plus TPU-specific extensions (precision, mesh, parity switches)
that the reference does not have.

Reference quirks handled here (see SURVEY.md §5.1):
  * ``--batch_size`` was parsed but ignored (hardcoded 4 at main.py:227) — we
    honor it, with the same default of 4.
  * ``--rand_seed`` was parsed but never used — we thread it into jax.random.
  * ``bug_parity`` (new flag) selects reference-exact behavior: detached
    generator recurrence (train.py:90,108), detached adversarial / layer
    losses (train.py:288,219), scrambled ``view`` reshapes in the Dt triplet
    assembly, and the fp16 grid cast.  With ``bug_parity=False`` the engine
    runs the *intended* TecoGAN formulation (gradients flow, aligned crops).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional


def str2bool(v) -> bool:
    """Boolean flag coercion with the same accepted spellings as the
    reference (``/root/reference/main.py:14-22``)."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


@dataclasses.dataclass
class TecoConfig:
    # ---- seeds -----------------------------------------------------------
    rand_seed: int = 1

    # ---- directories (reference main.py:37-51) ---------------------------
    input_dir_LR: str = ""
    input_dir_len: int = -1
    input_dir_HR: str = ""
    mode: str = "train"
    output_dir: str = "output"
    output_pre: str = ""
    output_name: str = "output"
    output_ext: str = "jpg"
    summary_dir: str = "summary"
    videotype: str = ".mp4"
    inferencetype: str = "dataset"

    # ---- models (reference main.py:54-69) --------------------------------
    g_checkpoint: Optional[str] = None
    d_checkpoint: Optional[str] = None
    num_resblock: int = 16
    discrim_resblocks: int = 4
    discrim_channels: int = 128
    pre_trained_model: bool = False
    vgg_ckpt: Optional[str] = None

    # ---- machine resources (reference main.py:72-74) ---------------------
    cudaID: str = "0"  # accepted for CLI compat; unused on TPU
    queue_thread: int = 8  # prefetch threads (reference parsed, never used)

    # ---- training details (reference main.py:79-95) ----------------------
    RNN_N: int = 10
    batch_size: int = 4
    flip: bool = True
    random_crop: bool = True
    movingFirstFrame: bool = True
    crop_size: int = 32
    input_video_dir: str = "../TrainingDataPath"
    input_video_pre: str = "scene"
    str_dir: int = 1000
    end_dir: int = 1400
    end_dir_val: int = 2050
    max_frm: int = 119

    # ---- loss parameters (reference main.py:98-103) ----------------------
    vgg_scaling: float = -0.002
    warp_scaling: float = 1.0
    pingpang: bool = False
    pp_scaling: float = 1.0

    # ---- optimizer (reference main.py:105-113) ---------------------------
    EPS: float = 1e-12
    learning_rate: float = 1e-4
    decay_step: int = 250
    decay_rate: float = 0.8
    stair: bool = False
    beta: float = 0.9
    adameps: float = 1e-8
    max_epochs: int = 10_000_000

    # ---- Dst parameters (reference main.py:116-126) ----------------------
    ratio: float = 0.01
    Dt_mergeDs: bool = True
    Dt_ratio_0: float = 1.0
    Dt_ratio_add: float = 0.0
    Dt_ratio_max: float = 1.0
    Dbalance: float = 0.4
    crop_dt: float = 0.75
    D_LAYERLOSS: bool = True

    # ---- TPU-native extensions (no reference counterpart) ----------------
    precision: str = "bf16"  # bf16 | fp32 compute (params always fp32)
    bug_parity: bool = True  # reproduce reference's detach/reshape quirks
    data_axis: int = 0  # number of data-parallel shards; 0 = all devices
    use_pallas: bool = True  # fused fast path (packed-gather warp + re-tiled conv)
    warp_group: int = 4  # base columns packed per warp-gather row (fast path)
    remat: bool = False  # rematerialize the per-frame generator step
    prefetch: int = 2  # device prefetch depth for the input pipeline
    log_every: int = 10  # steps between metric lines
    checkpoint_every: int = 1  # epochs between checkpoint saves
    steps_per_epoch: int = -1  # cap batches per epoch (-1 = full epoch)
    gather_unroll_streams: bool = True  # per-stream warp gathers at B>1
    # (internal, no CLI flag: right for a LOCAL batch dim, wrong when the
    # batch axis is mesh-sharded — build_dp_inference turns it off so each
    # shard keeps the fast B=1 gather graph instead of table[b] slices
    # that would force cross-device movement)
    steps_per_dispatch: int = 1  # train steps scanned inside one dispatch
    # (>1 only helps on dispatch-bound links — measured SLOWER on the
    # v5e remote setup; see DESIGN.md dispatch-granularity A/B)
    infer_chunk: int = 0  # streaming inference window: 0 auto (engage on
    # clips whose SR output exceeds ~2 GB), -1 one-shot always, >0 fixed
    # window size (device + host memory O(window), any clip length)
    quantize: str = ""  # "int8": W8A8 quantized generator tail for
    # serving (engine/quant.py) — activation scales calibrated on the
    # first clip; applies to the one-shot AND chunked-streaming clip
    # paths (DP stays bf16); requires bug_parity=False
    quantize_calib: str = "first_clip"  # int8 activation-scale policy:
    # "first_clip" calibrates once on the first served clip and reuses
    # the qtail (cheapest; heterogeneous batches risk mismatched
    # ranges), "per_clip" recalibrates on every clip (8 frames — cheap)
    # and, on the DP path, on every stacked batch.
    transfer_dtype: str = "f32"  # "u8": upload train batches (and
    # chunked-inference LR windows) as uint8, deprocess on device — 4x
    # fewer H2D bytes over a remote link AND 4x less host memory lost to
    # per-transfer client leaks (DESIGN.md).  Quantizes augmented pixels
    # to 1/255 (the PNGs' native grid); keep f32 for bit-parity runs.
    adapt_steps: int = 0  # >0: ZSSR-style test-time adaptation — fine-tune
    # the generator on each served clip's own internal LR->LR/4 pairs +
    # serving-scale LR-consistency for this many steps before SR
    # (engine/adapt.py; no external data, beats bicubic on real content
    # where the base synthetic-trained checkpoint cannot).
    adapt_lr: float = 1e-4  # adaptation Adam learning rate (cosine-decayed)
    adapt_consistency: float = 2.0  # weight of the serving-scale
    # down4(G(clip)) == clip consistency term (the in-network IBP)
    adapt_frames: int = 40  # cap on frames used to build internal pairs
    consistency_refine: int = 0  # >0: post-hoc iterative back-projection
    # steps on the SR output (no training; the cheap fallback to
    # --adapt_steps; engine/adapt.lr_consistency_refine)
    spatial_shards: int = 0  # >1: spatially shard ONE stream's frames
    # (output rows) over that many devices with halo-exchanged convs and
    # a per-frame warp all-gather (parallel/spatial.py) — the fps-scaling
    # axis for >1080p single-stream serving.  Exact-path math; clamped to
    # the largest divisor of the clip height <= the requested count.
    rss_limit_gb: float = 0.0  # >0: at epoch end, if host RSS exceeds
    # this, checkpoint and exit(75) for a supervisor restart (leaking
    # remote-TPU clients; auto_resume picks the run back up).  0 = off.
    profile_dir: str = ""  # capture a jax.profiler trace of steps 10-15
    auto_resume: bool = False  # resume from output_dir checkpoints if present
    async_checkpoint: bool = True  # serialize checkpoints off the train loop
    validate_every: int = 0  # epochs between PSNR eval on the val split
    # (scenes end_dir+1..end_dir_val — the reference parsed end_dir_val
    # and never used it); 0 = off
    jit: bool = True  # disable only for debugging

    # ------------------------------------------------------------------
    @property
    def hr_size(self) -> int:
        return self.crop_size * 4

    @property
    def unrolled_frames(self) -> int:
        """Frames seen by the generator per step (ping-pong doubles the
        sequence to 2N-1: reference code/train.py:56-62)."""
        return self.RNN_N * 2 - 1 if self.pingpang else self.RNN_N

    def replace(self, **kw) -> "TecoConfig":
        return dataclasses.replace(self, **kw)


def build_parser() -> argparse.ArgumentParser:
    """Argparse surface mirroring /root/reference/main.py:33-127."""
    p = argparse.ArgumentParser(description="TecoGAN-TPU")
    d = TecoConfig()

    p.add_argument("--rand_seed", default=d.rand_seed, type=int, help="random seed")
    # Directories
    p.add_argument("--input_dir_LR", default=d.input_dir_LR, nargs="?")
    p.add_argument("--input_dir_len", default=d.input_dir_len, type=int)
    p.add_argument("--input_dir_HR", default=d.input_dir_HR, nargs="?")
    p.add_argument("--mode", default=d.mode, nargs="?", help="train, or inference")
    p.add_argument("--output_dir", default=d.output_dir)
    p.add_argument("--output_pre", default=d.output_pre, nargs="?")
    p.add_argument("--output_name", default=d.output_name, nargs="?")
    p.add_argument("--output_ext", default=d.output_ext, nargs="?")
    p.add_argument("--summary_dir", default=d.summary_dir, nargs="?")
    p.add_argument("--videotype", default=d.videotype, type=str)
    p.add_argument("--inferencetype", default=d.inferencetype, type=str)
    # Models
    p.add_argument("--g_checkpoint", default=d.g_checkpoint)
    p.add_argument("--d_checkpoint", default=d.d_checkpoint, nargs="?")
    p.add_argument("--num_resblock", type=int, default=d.num_resblock)
    p.add_argument("--discrim_resblocks", type=int, default=d.discrim_resblocks)
    p.add_argument("--discrim_channels", type=int, default=d.discrim_channels)
    p.add_argument("--pre_trained_model", type=str2bool, default=d.pre_trained_model)
    p.add_argument("--vgg_ckpt", default=d.vgg_ckpt)
    # Machine resources
    p.add_argument("--cudaID", default=d.cudaID)
    p.add_argument("--queue_thread", default=d.queue_thread, type=int)
    # Training details
    p.add_argument("--RNN_N", default=d.RNN_N, type=int, nargs="?")
    p.add_argument("--batch_size", default=d.batch_size, type=int)
    p.add_argument("--flip", default=d.flip, type=str2bool)
    p.add_argument("--random_crop", default=d.random_crop, type=str2bool)
    p.add_argument("--movingFirstFrame", default=d.movingFirstFrame, type=str2bool)
    p.add_argument("--crop_size", default=d.crop_size, type=int)
    p.add_argument("--input_video_dir", type=str, default=d.input_video_dir)
    p.add_argument("--input_video_pre", default=d.input_video_pre, type=str)
    p.add_argument("--str_dir", default=d.str_dir, type=int)
    p.add_argument("--end_dir", default=d.end_dir, type=int)
    p.add_argument("--end_dir_val", default=d.end_dir_val, type=int)
    p.add_argument("--max_frm", default=d.max_frm, type=int)
    # Loss parameters
    p.add_argument("--vgg_scaling", default=d.vgg_scaling, type=float)
    p.add_argument("--warp_scaling", default=d.warp_scaling, type=float)
    p.add_argument("--pingpang", default=d.pingpang, type=str2bool)
    p.add_argument("--pp_scaling", default=d.pp_scaling, type=float)
    # Training parameters
    p.add_argument("--EPS", default=d.EPS, type=float)
    p.add_argument("--learning_rate", default=d.learning_rate, type=float)
    p.add_argument("--decay_step", default=d.decay_step, type=int)
    p.add_argument("--decay_rate", default=d.decay_rate, type=float)
    p.add_argument("--stair", default=d.stair, type=str2bool)
    p.add_argument("--beta", default=d.beta, type=float)
    p.add_argument("--adameps", default=d.adameps, type=float)
    p.add_argument("--max_epochs", default=d.max_epochs, type=int)
    # Dst parameters
    p.add_argument("--ratio", default=d.ratio, type=float)
    p.add_argument("--Dt_mergeDs", default=d.Dt_mergeDs, type=str2bool)
    p.add_argument("--Dt_ratio_0", default=d.Dt_ratio_0, type=float)
    p.add_argument("--Dt_ratio_add", default=d.Dt_ratio_add, type=float)
    p.add_argument("--Dt_ratio_max", default=d.Dt_ratio_max, type=float)
    p.add_argument("--Dbalance", default=d.Dbalance, type=float)
    p.add_argument("--crop_dt", default=d.crop_dt, type=float)
    p.add_argument("--D_LAYERLOSS", default=d.D_LAYERLOSS, type=str2bool)
    # TPU-native extensions
    p.add_argument("--precision", default=d.precision, choices=["bf16", "fp32"])
    p.add_argument("--bug_parity", default=d.bug_parity, type=str2bool)
    p.add_argument("--data_axis", default=d.data_axis, type=int)
    p.add_argument("--use_pallas", default=d.use_pallas, type=str2bool)
    p.add_argument("--warp_group", default=d.warp_group, type=int)
    p.add_argument("--remat", default=d.remat, type=str2bool)
    p.add_argument("--prefetch", default=d.prefetch, type=int)
    p.add_argument("--log_every", default=d.log_every, type=int)
    p.add_argument("--checkpoint_every", default=d.checkpoint_every, type=int)
    p.add_argument("--steps_per_epoch", default=d.steps_per_epoch, type=int)
    p.add_argument("--steps_per_dispatch", default=d.steps_per_dispatch, type=int)
    p.add_argument("--infer_chunk", default=d.infer_chunk, type=int)
    p.add_argument("--quantize", default=d.quantize, choices=["", "int8"])
    p.add_argument("--quantize_calib", default=d.quantize_calib,
                   choices=["first_clip", "per_clip"])
    p.add_argument("--transfer_dtype", default=d.transfer_dtype,
                   choices=["f32", "u8"])
    p.add_argument("--adapt_steps", default=d.adapt_steps, type=int)
    p.add_argument("--adapt_lr", default=d.adapt_lr, type=float)
    p.add_argument("--adapt_consistency", default=d.adapt_consistency,
                   type=float)
    p.add_argument("--adapt_frames", default=d.adapt_frames, type=int)
    p.add_argument("--consistency_refine", default=d.consistency_refine,
                   type=int)
    p.add_argument("--spatial_shards", default=d.spatial_shards, type=int)
    p.add_argument("--rss_limit_gb", default=d.rss_limit_gb, type=float)
    p.add_argument("--profile_dir", default=d.profile_dir)
    p.add_argument("--validate_every", default=d.validate_every, type=int)
    p.add_argument("--auto_resume", default=d.auto_resume, type=str2bool)
    p.add_argument("--async_checkpoint", default=d.async_checkpoint, type=str2bool)
    p.add_argument("--jit", default=d.jit, type=str2bool)
    return p


def parse_config(argv=None) -> TecoConfig:
    ns = build_parser().parse_args(argv)
    fields = {f.name for f in dataclasses.fields(TecoConfig)}
    return TecoConfig(**{k: v for k, v in vars(ns).items() if k in fields})
