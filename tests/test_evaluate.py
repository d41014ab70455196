"""Evaluate-harness tests (cli/evaluate.py): pair scoring and the
model+HR-dir eval path."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tecogan_tpu.data import write_synthetic_scene_folders


def run_eval(args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
    return subprocess.run(
        [sys.executable, "-m", "tecogan_tpu.cli.evaluate"] + args,
        env=env, capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )


def test_pair_scoring_identical_frames(tmp_path):
    """Identical sr/hr dirs -> inf/very-high PSNR, SSIM 1."""
    d = str(tmp_path / "scenes")
    write_synthetic_scene_folders(d, num_scenes=1, frames_per_scene=4, size=32)
    scene = os.path.join(d, "scene_1000")
    r = run_eval(["--sr_dir", scene, "--hr_dir", scene, "--limit_frames", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    recs = [json.loads(l) for l in r.stdout.strip().splitlines()]
    agg = [x for x in recs if x["clip"] == "__aggregate__"][0]
    assert agg["psnr_db"] > 60 or np.isinf(agg["psnr_db"])
    assert agg["ssim"] > 0.999


def test_pair_scoring_degraded(tmp_path, rng):
    """Noised copy scores lower but finite."""
    import imageio

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    os.makedirs(a), os.makedirs(b)
    for t in range(3):
        img = rng.random((32, 32, 3)).astype(np.float32)
        noisy = np.clip(img + rng.normal(0, 0.05, img.shape), 0, 1)
        imageio.imwrite(os.path.join(a, f"f{t:02d}.png"), (img * 255).astype(np.uint8))
        imageio.imwrite(os.path.join(b, f"f{t:02d}.png"), (noisy * 255).astype(np.uint8))
    r = run_eval(["--sr_dir", a, "--hr_dir", b])
    assert r.returncode == 0, r.stderr[-2000:]
    agg = [json.loads(l) for l in r.stdout.strip().splitlines()][-1]
    assert 15 < agg["psnr_db"] < 40


def test_requires_args():
    r = run_eval([])
    assert r.returncode != 0
    assert "need either" in (r.stderr + r.stdout)
