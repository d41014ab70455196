from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    batch_sharding,
    multi_batch_sharding,
    replicated,
    shard_batch,
    replicate_state,
)
from .dp import (
    build_dp_train_step,
    build_dp_multi_train_step,
    build_dp_inference,
    build_dp_quantized_inference,
)
from .tp import build_tp_train_step, shard_state_tp, state_shardings

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "make_mesh", "batch_sharding", "replicated",
    "shard_batch", "replicate_state", "build_dp_train_step",
    "build_dp_multi_train_step", "build_dp_inference", "multi_batch_sharding",
    "build_dp_quantized_inference",
    "build_tp_train_step", "shard_state_tp", "state_shardings",
]
