"""Checkpoint save/load.

Reference behavior (main.py:308-317): per-epoch dicts
``{epoch, model_state_dict, optimizer_state_dict}`` -> ``generator.pt`` and
``{model_state_dict, optimizer_state_dict}`` -> ``discrim.pt``; resume via
``--pre_trained_model`` (main.py:251-263); inference loads the generator
dict (main.py:169-170).

We mirror that contract with two files (``generator.ckpt`` /
``discrim.ckpt``) holding msgpack-free numpy pytrees (np.savez of flattened
paths), so checkpoints are portable, dependency-light, and loadable by the
inference CLI identically.  ``save_train_state``/``load_train_state`` wrap
the pair.  Torch ``.pt`` checkpoints from the reference can be converted
with tools/convert_torch_ckpt.py.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax


_SEP = "//"


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _SEP.join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(entry) -> str:
    if hasattr(entry, "key"):
        return str(entry.key)
    if hasattr(entry, "idx"):
        return f"#{entry.idx}"
    if hasattr(entry, "name"):
        return str(entry.name)
    return str(entry)


def save_pytree(path: str, tree: Any, meta: Optional[Dict[str, Any]] = None) -> None:
    write_pytree_tmp(path, tree, meta)
    os.replace(path + ".tmp.npz", path)


def write_pytree_tmp(path: str, tree: Any, meta: Optional[Dict[str, Any]] = None) -> str:
    """Serialize to ``path + '.tmp.npz'`` without publishing it; the caller
    renames.  Lets multi-file checkpoints commit all-or-nothing."""
    flat = _flatten(tree)
    if meta:
        for k, v in meta.items():
            flat[f"__meta__{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    return tmp


def load_flat(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    with np.load(path, allow_pickle=False) as z:
        data, meta = {}, {}
        for k in z.files:
            if k.startswith("__meta__"):
                meta[k[len("__meta__"):]] = z[k]
            else:
                data[k] = z[k]
    return data, meta


def restore_into(template: Any, flat: Dict[str, np.ndarray]) -> Any:
    """Rebuild a pytree with the template's structure from flattened leaves."""
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, tmpl_leaf in paths_leaves:
        key = _SEP.join(_path_str(p) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = flat[key]
        if tuple(arr.shape) != tuple(np.shape(tmpl_leaf)):
            raise ValueError(
                f"shape mismatch for {key!r}: ckpt {arr.shape} vs model "
                f"{np.shape(tmpl_leaf)}"
            )
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Rebuild a nested dict from ``_SEP``-joined flat keys (inverse of
    ``_flatten`` for dict-only trees; the single owner of the flat-key
    scheme — use this instead of hand-rolling the split)."""
    tree: Dict[str, Any] = {}
    for path, arr in flat.items():
        node = tree
        parts = path.split(_SEP)
        for key in parts[:-1]:
            node = node.setdefault(key, {})
        node[parts[-1]] = arr
    return tree


# ---------------------------------------------------------------------------
# TrainState-level API (generator.ckpt / discrim.ckpt pair like the
# reference's generator.pt / discrim.pt)
# ---------------------------------------------------------------------------

def generator_ckpt_path(output_dir: str) -> str:
    return os.path.join(output_dir, "generator.ckpt")


def discriminator_ckpt_path(output_dir: str) -> str:
    return os.path.join(output_dir, "discrim.ckpt")


_ASYNC_SAVER: dict = {"thread": None}


def save_train_state(output_dir: str, state, epoch: int, async_save: bool = False) -> None:
    """Write the generator/discriminator checkpoint pair.

    ``async_save=True`` runs serialization in a background thread (the
    tensors are device_get'd synchronously first, so training can proceed);
    writes are atomic (tmp + rename), and a pending async save is joined
    before starting the next — crash recovery always sees a complete pair
    (SURVEY §5 failure-detection row).
    """
    import threading

    def _write():
        # Serialize BOTH files to tmp names first, then rename both: a crash
        # mid-save can never publish a new G paired with a stale D.
        gp = generator_ckpt_path(output_dir)
        dp = discriminator_ckpt_path(output_dir)
        g_tmp = write_pytree_tmp(
            gp,
            {"model_state_dict": state.params_g, "optimizer_state_dict": state.opt_g},
            meta={"epoch": epoch, "step": int(state.step)},
        )
        d_tmp = write_pytree_tmp(
            dp,
            {
                "model_state_dict": state.params_d,
                "optimizer_state_dict": state.opt_d,
                "batch_stats": state.batch_stats_d,
            },
            meta={"epoch": epoch},
        )
        os.replace(g_tmp, gp)
        os.replace(d_tmp, dp)

    prev = _ASYNC_SAVER["thread"]
    if prev is not None:
        prev.join()
        _ASYNC_SAVER["thread"] = None
    if async_save:
        t = threading.Thread(target=_write, daemon=False)
        t.start()
        _ASYNC_SAVER["thread"] = t
    else:
        _write()


def wait_for_async_save() -> None:
    prev = _ASYNC_SAVER["thread"]
    if prev is not None:
        prev.join()
        _ASYNC_SAVER["thread"] = None


def has_checkpoint(output_dir: str) -> bool:
    """True when a complete checkpoint pair exists (auto-resume probe)."""
    return os.path.exists(generator_ckpt_path(output_dir)) and os.path.exists(
        discriminator_ckpt_path(output_dir)
    )


def load_train_state(output_dir: str, state, g_path=None, d_path=None):
    """Returns (state, epoch) with params/opt restored — the
    --pre_trained_model resume path (main.py:251-263)."""
    import jax.numpy as jnp

    gp = g_path or generator_ckpt_path(output_dir)
    dp = d_path or discriminator_ckpt_path(output_dir)
    g_flat, g_meta = load_flat(gp)
    g_tree = restore_into(
        {"model_state_dict": state.params_g, "optimizer_state_dict": state.opt_g},
        g_flat,
    )
    d_flat, d_meta = load_flat(dp)
    d_tree = restore_into(
        {
            "model_state_dict": state.params_d,
            "optimizer_state_dict": state.opt_d,
            "batch_stats": state.batch_stats_d,
        },
        d_flat,
    )
    if "epoch" in d_meta and int(d_meta["epoch"]) != int(g_meta.get("epoch", 0)):
        raise ValueError(
            f"torn checkpoint pair: generator epoch {int(g_meta.get('epoch', 0))} "
            f"!= discriminator epoch {int(d_meta['epoch'])} in {output_dir}"
        )
    epoch = int(g_meta.get("epoch", 0))
    step = int(g_meta.get("step", 0))
    new_state = state.replace(
        params_g=g_tree["model_state_dict"],
        opt_g=g_tree["optimizer_state_dict"],
        params_d=d_tree["model_state_dict"],
        opt_d=d_tree["optimizer_state_dict"],
        batch_stats_d=d_tree["batch_stats"],
        step=jnp.asarray(step, jnp.int32),
        epoch=jnp.asarray(epoch, jnp.int32),
    )
    return new_state, epoch


def save_generator_params(path: str, params_g, meta=None) -> None:
    """Generator-params-only save (the shape load_generator_params reads):
    used by test-time adaptation (tools/adapt_clip.py) to persist per-clip
    adapted weights without an optimizer state."""
    import jax

    save_pytree(path, {"model_state_dict": jax.device_get(params_g)},
                meta=meta)


def load_generator_params(path: str, params_template):
    """Inference-side load (main.py:169-170): generator params only.
    Accepts our .ckpt or a converted torch checkpoint."""
    flat, _ = load_flat(path)
    return restore_into({"model_state_dict": params_template}, flat)[
        "model_state_dict"
    ]
