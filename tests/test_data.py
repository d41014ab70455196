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
        RNN_N=9, bug_parity=False,  # fixed-mode pipeline unless a test
        # opts into the reference's sampling quirks
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


def test_bug_parity_len_is_scene_count(scene_root):
    """Reference __len__ returns the SCENE count (dataloader.py:62-65,
    78-79), so only the first num_scenes windows are ever drawn — all of
    them windows of scene 0 here (flat list order, 110 per scene)."""
    ds = TrainDataset(make_cfg(scene_root, bug_parity=True))
    assert len(ds) == 2
    # the two reachable samples are scene 0's windows 0 and 1
    assert ds.windows[0] == (0, 0)
    assert ds.windows[1] == (0, 1)
    # one epoch draws exactly those indices, partial batch kept
    # (DataLoader drop_last=False default)
    batches = list(ds.batches(batch_size=4, shuffle=True, seed=0))
    assert len(batches) == 1
    assert batches[0][0].shape[0] == 2


def test_bug_parity_frame0_misaligned(scene_root):
    """Reference frame-0 quirk (dataloader.py:71-72,91-93): frames 1..N
    are the full source frame resized; frame 0 alone goes through an
    INDEPENDENT RandomResizedCrop for LR and HR."""
    from tecogan_tpu.data.scenes import _resize_bilinear

    cfg = make_cfg(scene_root, bug_parity=True)
    ds = TrainDataset(cfg)
    rng = np.random.default_rng(7)
    lr, hr = ds.get_clip(0, rng)
    # frames 1+ equal the plain full-frame resize
    src1 = ds._frame(ds.scenes[0][1])
    np.testing.assert_allclose(
        hr[1], _resize_bilinear(src1, 32, 32).transpose(2, 0, 1), atol=1e-6
    )
    np.testing.assert_allclose(
        lr[1], _resize_bilinear(src1, 8, 8).transpose(2, 0, 1), atol=1e-6
    )
    # frame 0 is cropped — misaligned vs the plain resize...
    src0 = ds._frame(ds.scenes[0][0])
    plain_hr0 = _resize_bilinear(src0, 32, 32).transpose(2, 0, 1)
    plain_lr0 = _resize_bilinear(src0, 8, 8).transpose(2, 0, 1)
    assert np.abs(hr[0] - plain_hr0).mean() > 1e-4
    assert np.abs(lr[0] - plain_lr0).mean() > 1e-4
    # ...and LR/HR frame 0 are misaligned against each other (independent
    # crops): downscaling HR frame 0 does NOT reproduce LR frame 0
    hr0_down = _resize_bilinear(
        np.ascontiguousarray(hr[0].transpose(1, 2, 0)), 8, 8
    ).transpose(2, 0, 1)
    assert np.abs(hr0_down - lr[0]).mean() > 1e-3


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


class TestCaptures:
    """Procedural captures + create_capture factory (reference
    data/video.py:40-206, data/common.py:73-90)."""

    def test_chess_renders_and_seeks(self):
        from tecogan_tpu.data import Chess

        cap = Chess(size="64x48")
        ok, f1 = cap.read()
        assert ok and f1.shape == (48, 64, 3) and f1.dtype == np.uint8
        ok, f2 = cap.read()
        assert not np.array_equal(f1, f2)  # the camera orbits
        # seek determinism: same frame index -> same pixels
        cap.set(1, 0)
        ok, g1 = cap.read()
        cap2 = Chess(size="64x48")
        ok, h1 = cap2.read()
        np.testing.assert_array_equal(g1, h1)

    def test_book_and_cube_move(self):
        from tecogan_tpu.data import Book, Cube

        for cls in (Book, Cube):
            cap = cls(size="64x64")
            ok, f1 = cap.read()
            ok, f2 = cap.read()
            assert ok and f1.shape == (64, 64, 3)
            assert not np.array_equal(f1, f2)

    def test_create_capture_synth_spec_and_fallback(self):
        from tecogan_tpu.data import create_capture, Chess, SynthCapture

        cap = create_capture("synth:class=chess:size=32x32:noise=0.1")
        assert isinstance(cap, Chess)
        ok, f = cap.read()
        assert ok and f.shape == (32, 32, 3)
        # bogus file -> chess fallback like the reference
        cap = create_capture("/nonexistent/video.mp4")
        assert isinstance(cap, SynthCapture)
        assert cap.isOpened()

    def test_lookat_mtx2rvec_roundtrip(self):
        import cv2
        from tecogan_tpu.data import lookat, mtx2rvec

        R, tvec = lookat((10.0, 3.0, 5.0), (0.0, 0.0, 0.0))
        # R is a rotation: orthonormal, det +1
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)
        # axis-angle roundtrip through cv2.Rodrigues
        rvec = mtx2rvec(R)
        R2 = cv2.Rodrigues(rvec)[0]
        np.testing.assert_allclose(R2, R, atol=1e-8)

    def test_dataprepare_synth_fallback_extracts_scene(self, tmp_path):
        from tecogan_tpu.data.dataprepare import extract_scenes

        n = extract_scenes("/nonexistent/video.mp4", [0], str(tmp_path), 1000,
                           frames_per_scene=6)
        assert n == 1001
        files = sorted(os.listdir(tmp_path / "scene_1000"))
        assert files == [f"col_high_{i:04d}.png" for i in range(6)]


def test_frame_cache_is_lossless_and_bounded(scene_root):
    """The decoded-frame cache must return byte-identical pixels to a
    direct decode (PNGs are 8-bit, the cache stores uint8), and evict
    FIFO once the byte cap is hit."""
    ds_cached = TrainDataset(make_cfg(scene_root))
    ds_cold = TrainDataset(make_cfg(scene_root), cache_mb=0)
    for idx in (0, 1, WINDOWS_PER_SCENE):
        a = ds_cached.get_clip(idx)
        b = ds_cold.get_clip(idx)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
    # second fetch comes from cache and matches exactly
    a2 = ds_cached.get_clip(0)
    np.testing.assert_array_equal(a2[1], ds_cold.get_clip(0)[1])
    assert ds_cached._cache_bytes > 0
    # tiny cap: cache stays bounded under churn
    ds_tiny = TrainDataset(make_cfg(scene_root), cache_mb=1)
    for idx in range(0, 3 * WINDOWS_PER_SCENE // 2, 7):
        ds_tiny.get_clip(idx % len(ds_tiny))
    assert ds_tiny._cache_bytes <= 1 << 20


def test_create_capture_colon_sources_dont_crash():
    """Sources with ':' that aren't spec grammar (URLs, odd paths) must
    reach cv2.VideoCapture / the fallback instead of raising ValueError
    in the param parse."""
    from tecogan_tpu.data.capture import create_capture

    cap = create_capture("rtsp://nonexistent.host/stream",
                         fallback="synth:class=chess:size=32x32")
    assert cap is not None and cap.isOpened()
    ok, frame = cap.read()
    assert ok and frame.shape == (32, 32, 3)


def test_create_capture_malformed_synth_spec_raises():
    """Typo'd synth specs must surface, not silently become the default
    fallback capture."""
    from tecogan_tpu.data.capture import create_capture

    with pytest.raises(ValueError, match="malformed synth spec"):
        create_capture("synth:class=book:noise0.1")


def test_batches_workers_parallel_matches_serial(scene_root):
    """workers>1 must yield the same batches as the serial path (clip
    augmentation RNG is position-derived, not thread-scheduling-derived)."""
    cfg = make_cfg(scene_root)
    ds_a = TrainDataset(cfg)
    ds_b = TrainDataset(cfg)
    serial = list(ds_a.batches(2, shuffle=True, seed=5, workers=0))
    threaded = list(ds_b.batches(2, shuffle=True, seed=5, workers=4))
    assert len(serial) == len(threaded) > 0
    for (la, ha), (lb, hb) in zip(serial, threaded):
        np.testing.assert_array_equal(la, lb)
        np.testing.assert_array_equal(ha, hb)
