"""Checkpoint tests: pytree save/load roundtrip, resume semantics, and
shape-mismatch failure (SURVEY.md §5 checkpoint/resume row)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.engine import init_state
from tecogan_tpu.utils.checkpoint import (
    save_pytree,
    load_flat,
    restore_into,
    save_train_state,
    load_train_state,
    load_generator_params,
    generator_ckpt_path,
)


def cfg():
    return TecoConfig(
        crop_size=8, RNN_N=9, num_resblock=2, discrim_resblocks=1,
        discrim_channels=16, precision="fp32",
    )


def test_pytree_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones((4,))}}
    p = str(tmp_path / "x.ckpt")
    save_pytree(p, tree, meta={"epoch": 7})
    flat, meta = load_flat(p)
    assert int(meta["epoch"]) == 7
    back = restore_into(tree, flat)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.asarray(tree["a"]))


def test_train_state_roundtrip(tmp_path):
    c = cfg()
    s = init_state(c, jax.random.PRNGKey(0))
    save_train_state(str(tmp_path), s, epoch=5)

    s2 = init_state(c, jax.random.PRNGKey(42))  # different init
    s2, epoch = load_train_state(str(tmp_path), s2)
    assert epoch == 5
    same = jax.tree.all(
        jax.tree.map(lambda a, b: bool(jnp.allclose(a, b)), s.params_g, s2.params_g)
    )
    assert same
    # optimizer state restored too
    same_opt = jax.tree.all(
        jax.tree.map(
            lambda a, b: bool(jnp.allclose(jnp.asarray(a, jnp.float32),
                                            jnp.asarray(b, jnp.float32))),
            s.opt_g, s2.opt_g,
        )
    )
    assert same_opt


def test_generator_only_load(tmp_path):
    c = cfg()
    s = init_state(c, jax.random.PRNGKey(0))
    save_train_state(str(tmp_path), s, epoch=0)
    params = load_generator_params(generator_ckpt_path(str(tmp_path)), s.params_g)
    same = jax.tree.all(
        jax.tree.map(lambda a, b: bool(jnp.allclose(a, b)), s.params_g, params)
    )
    assert same


def test_shape_mismatch_raises(tmp_path):
    c = cfg()
    s = init_state(c, jax.random.PRNGKey(0))
    save_train_state(str(tmp_path), s, epoch=0)
    big = init_state(c.replace(num_resblock=4), jax.random.PRNGKey(0))
    with pytest.raises((KeyError, ValueError)):
        load_generator_params(generator_ckpt_path(str(tmp_path)), big.params_g)


def test_async_save_and_auto_resume_probe(tmp_path):
    from tecogan_tpu.utils.checkpoint import (
        has_checkpoint,
        wait_for_async_save,
    )

    c = cfg()
    s = init_state(c, jax.random.PRNGKey(0))
    assert not has_checkpoint(str(tmp_path))
    save_train_state(str(tmp_path), s, epoch=2, async_save=True)
    wait_for_async_save()
    assert has_checkpoint(str(tmp_path))
    s2, epoch = load_train_state(str(tmp_path), init_state(c, jax.random.PRNGKey(1)))
    assert epoch == 2


def test_torn_pair_detected(tmp_path):
    """A new G paired with a stale D (different epoch stamps) must be
    rejected on resume instead of silently mixing states."""
    import pytest
    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.engine import init_state
    from tecogan_tpu.utils.checkpoint import (
        save_train_state, load_train_state, generator_ckpt_path,
        discriminator_ckpt_path,
    )
    import jax

    cfg = TecoConfig(crop_size=8, num_resblock=1, discrim_resblocks=1,
                     discrim_channels=16, precision="fp32")
    state = init_state(cfg, jax.random.PRNGKey(0))
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    save_train_state(d1, state, epoch=1)
    save_train_state(d2, state, epoch=2)
    # simulate a crash between the pair publishes: epoch-2 G, epoch-1 D
    import shutil
    shutil.copy(generator_ckpt_path(d2), generator_ckpt_path(d1))
    with pytest.raises(ValueError, match="torn checkpoint pair"):
        load_train_state(d1, state)
