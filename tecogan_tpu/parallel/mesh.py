"""Device mesh + sharding helpers.

The reference is single-GPU (SURVEY.md §2.2: no torch.distributed anywhere);
data-parallel bf16 training over ICI is new capability mandated by
BASELINE.md (v5e-8 config).  Design: a 2-axis ``(data, model)`` mesh — DP is
first-class today; the ``model`` axis is reserved so conv channel sharding
can land without an API break.  Replicated params + batch-sharded inputs
under ``jax.jit`` let XLA's SPMD partitioner insert the gradient
all-reduces over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    n_data=None uses all devices on the data axis (the v5e-8 DP config).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None or n_data <= 0:
        n_data = len(devices) // n_model
    use = n_data * n_model
    arr = np.asarray(devices[:use]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def multi_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 1 (batch) over ``data`` for (K, B, ...) stacked-step
    inputs (engine.train.build_multi_train_step)."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host arrays with the batch dim sharded over ``data``."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate_state(mesh: Mesh, state):
    """Replicate a pytree (train state / params) across the mesh."""
    sh = replicated(mesh)
    return jax.device_put(state, sh)
