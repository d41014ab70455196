"""Data pipeline tests: scene scanning, window math, LR/HR pairing,
clip-consistent augmentation, prefetch, and media IO."""

import os

import numpy as np
import pytest

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.data import (
    TrainDataset,
    InferenceDataset,
    WINDOWS_PER_SCENE,
    write_synthetic_scene_folders,
    moving_rect_scene,
    chess_scene,
    synthetic_scene_batch,
    make_input_pipeline,
)
from tecogan_tpu.ops import save_as_media


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scenes"))
    write_synthetic_scene_folders(root, num_scenes=2, frames_per_scene=120, size=48)
    return root


def make_cfg(root, **kw):
    base = dict(
        input_video_dir=root, str_dir=1000, end_dir=1001, crop_size=8,
        RNN_N=9,
    )
    base.update(kw)
    return TecoConfig(**base)


def test_scene_layout(scene_root):
    dirs = sorted(os.listdir(scene_root))
    assert dirs == ["scene_1000", "scene_1001"]
    frames = sorted(os.listdir(os.path.join(scene_root, "scene_1000")))
    assert frames[0] == "col_high_0000.png"
    assert len(frames) == 120


def test_train_dataset_window_count(scene_root):
    """__len__ must count windows (110 per scene), fixing SURVEY §5.1.4."""
    ds = TrainDataset(make_cfg(scene_root))
    assert len(ds) == 2 * WINDOWS_PER_SCENE


def test_clip_shapes_and_pairing(scene_root):
    cfg = make_cfg(scene_root)
    ds = TrainDataset(cfg)
    lr, hr = ds.get_clip(0)
    assert lr.shape == (9, 3, 8, 8)
    assert hr.shape == (9, 3, 32, 32)
    assert lr.dtype == np.float32
    assert 0.0 <= lr.min() and lr.max() <= 1.0
    # LR is a downscale of HR content: coarse means should track closely
    assert abs(lr.mean() - hr.mean()) < 0.05


def test_augmentation_is_clip_consistent(scene_root):
    """Random crop/flip must be identical across all frames of a clip
    (the intent of main.py:81-84; reference misaligned frame 0)."""
    cfg = make_cfg(scene_root, random_crop=True, flip=True,
                   movingFirstFrame=False)
    ds = TrainDataset(cfg)
    rng = np.random.default_rng(3)
    lr, hr = ds.get_clip(5, rng)
    # frame-to-frame diffs should be small (scene moves slowly) — a
    # misaligned frame 0 (reference bug) would make frame0-vs-frame1 much
    # larger than frame1-vs-frame2.
    d01 = np.abs(hr[0] - hr[1]).mean()
    d12 = np.abs(hr[1] - hr[2]).mean()
    assert d01 < 4 * d12 + 0.05


def test_moving_first_frame_synthesizes_motion(scene_root):
    """movingFirstFrame clips are built from frame 0 with constant sliding
    motion (intent of main.py:83-84; the reference never wired the flag)."""
    cfg = make_cfg(scene_root, movingFirstFrame=True, random_crop=False,
                   flip=False)
    ds = TrainDataset(cfg)
    hit = False
    for seed in range(20):
        rng = np.random.default_rng(seed)
        p = rng.random()  # mirror of the dataset's trigger draw
        lr, hr = ds.get_clip(0, np.random.default_rng(seed))
        assert lr.shape == (9, 3, 8, 8)
        if p < 0.3:
            hit = True
    assert hit, "movingFirstFrame never triggered in 20 seeds"


def test_batches_shapes_and_batch_size(scene_root):
    """--batch_size must be honored (reference hardcoded 4, main.py:227)."""
    cfg = make_cfg(scene_root)
    ds = TrainDataset(cfg)
    it = ds.batches(batch_size=3, shuffle=True, seed=0)
    lr, hr = next(it)
    assert lr.shape == (3, 9, 3, 8, 8)
    assert hr.shape == (3, 9, 3, 32, 32)


def test_input_pipeline_prefetch(scene_root):
    cfg = make_cfg(scene_root)
    ds = TrainDataset(cfg)
    it = make_input_pipeline(
        ds.batches(2, shuffle=False), queue_threads=2, prefetch=2
    )
    batches = [next(it) for _ in range(3)]
    assert all(b[0].shape == (2, 9, 3, 8, 8) for b in batches)


def test_inference_dataset(scene_root):
    cfg = make_cfg(scene_root).replace(input_dir_LR=scene_root)
    ds = InferenceDataset(cfg)
    assert len(ds) == 2
    clip = ds.get_clip(0)
    assert clip.shape == (120, 8, 8, 3)


def test_inference_dataset_hr_fallback(scene_root, tmp_path):
    cfg = make_cfg(scene_root).replace(input_dir_LR="", input_dir_HR=scene_root)
    ds = InferenceDataset(cfg)
    assert ds.down_sample is True
    assert len(ds) == 2


def test_synthetic_generators_deterministic():
    a = moving_rect_scene(5, 32, 32, seed=1)
    b = moving_rect_scene(5, 32, 32, seed=1)
    np.testing.assert_array_equal(a, b)
    c = chess_scene(4, 32, 32)
    assert c.shape == (4, 32, 32, 3)
    lr, hr = synthetic_scene_batch(2, 3, 8)
    assert lr.shape == (2, 3, 3, 8, 8)
    assert hr.shape == (2, 3, 3, 32, 32)


def test_media_roundtrip(tmp_path, rng):
    frames = rng.random((4, 16, 16, 3)).astype(np.float32)
    gif = str(tmp_path / "x.gif")
    mp4 = str(tmp_path / "x.mp4")
    save_as_media(frames, gif)
    save_as_media(frames, mp4)
    assert os.path.getsize(gif) > 0
    import cv2

    cap = cv2.VideoCapture(mp4)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 4
    cap.release()
