"""Device mesh + sharding helpers.

The reference is single-GPU (SURVEY.md §2.2: no torch.distributed anywhere);
data-parallel bf16 training over ICI is new capability mandated by
BASELINE.md (v5e-8 config).  Design: a ``(slice, data, model)`` mesh — DP is
first-class today; the ``model`` axis is reserved-but-functional for conv
channel sharding (parallel/tp.py), and the optional outermost ``slice`` axis
is the multislice/DCN stub: batch sharding spans (slice, data) so the SPMD
partitioner places the slow inter-slice leg of the gradient all-reduce on
DCN and the fast intra-slice leg on ICI.  Replicated params + batch-sharded
inputs under ``jax.jit`` let XLA insert the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


SLICE_AXIS = "slice"
DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
    n_slice: int = 1,
) -> Mesh:
    """Build a mesh over the available devices.

    n_data=None uses all devices on the data axis (the v5e-8 DP config).
    n_slice > 1 adds the outermost DCN axis — axis order (slice, data,
    model) keeps each data-parallel group inside one slice, so per-step
    collectives ride ICI and only the cross-slice reduce crosses DCN.
    The 2-axis mesh is returned unchanged when n_slice == 1 (no surprise
    axis for existing PartitionSpecs).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None or n_data <= 0:
        n_data = len(devices) // (n_model * n_slice)
    use = n_data * n_model * n_slice
    if use > len(devices):
        raise ValueError(
            f"mesh {n_slice}x{n_data}x{n_model} needs {use} devices, "
            f"only {len(devices)} visible"
        )
    if n_slice > 1:
        arr = np.asarray(devices[:use]).reshape(n_slice, n_data, n_model)
        return Mesh(arr, (SLICE_AXIS, DATA_AXIS, MODEL_AXIS))
    arr = np.asarray(devices[:use]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _data_axes(mesh: Mesh):
    """The mesh axes a batch dim shards over: (slice, data) when the DCN
    axis exists, else data alone."""
    if SLICE_AXIS in mesh.axis_names:
        return (SLICE_AXIS, DATA_AXIS)
    return DATA_AXIS


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axes."""
    return NamedSharding(mesh, P(_data_axes(mesh)))


def multi_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 1 (batch) over the data axes for (K, B, ...) stacked-step
    inputs (engine.train.build_multi_train_step)."""
    return NamedSharding(mesh, P(None, _data_axes(mesh)))


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
