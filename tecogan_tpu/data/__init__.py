from .scenes import (
    TrainDataset,
    InferenceDataset,
    load_video_frames,
    scan_scene_dirs,
    WINDOWS_PER_SCENE,
    FRAMES_PER_WINDOW,
)
from .synthetic import (
    moving_rect_scene,
    chess_scene,
    synthetic_scene_batch,
    write_synthetic_scene_folders,
)
from .prefetch import threaded_batches, device_prefetch, make_input_pipeline
from .capture import (
    create_capture,
    SynthCapture,
    Chess,
    Book,
    Cube,
    SceneRender,
    lookat,
    mtx2rvec,
)

__all__ = [
    "TrainDataset", "InferenceDataset", "load_video_frames", "scan_scene_dirs",
    "WINDOWS_PER_SCENE", "FRAMES_PER_WINDOW",
    "moving_rect_scene", "chess_scene", "synthetic_scene_batch",
    "write_synthetic_scene_folders",
    "threaded_batches", "device_prefetch", "make_input_pipeline",
    "create_capture", "SynthCapture", "Chess", "Book", "Cube", "SceneRender",
    "lookat", "mtx2rvec",
]
