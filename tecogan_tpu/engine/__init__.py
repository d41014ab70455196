from .state import TrainState, init_state, make_optimizers, model_defs, lr_schedule
from .train import build_train_step, build_multi_train_step, set_epoch
from .adapt import adapt_generator, lr_consistency_refine
from .inference import (
    build_clip_inference,
    build_chunked_inference,
    build_stream_inference,
    sr_step,
    first_frame,
    StreamState,
)

__all__ = [
    "TrainState", "init_state", "make_optimizers", "model_defs", "lr_schedule",
    "build_train_step", "build_multi_train_step", "set_epoch",
    "build_clip_inference", "build_chunked_inference",
    "build_stream_inference", "sr_step", "first_frame",
    "StreamState", "adapt_generator", "lr_consistency_refine",
]
