"""Distributed tests on the 8-virtual-CPU-device mesh (SURVEY.md §4c):
DP train step runs sharded, matches the single-device step numerically,
and the driver's dryrun_multichip contract holds."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.engine import init_state, build_train_step
from tecogan_tpu.parallel import (
    make_mesh,
    build_dp_train_step,
    replicate_state,
    shard_batch,
)

from conftest import cached_clip_inference, cached_train_step


def cfg8(**kw):
    base = dict(
        crop_size=8, RNN_N=9, num_resblock=1, discrim_resblocks=1,
        discrim_channels=16, batch_size=8, precision="fp32",
    )
    base.update(kw)
    return TecoConfig(**base)


@pytest.fixture(scope="module")
def batch8():
    rng = np.random.default_rng(0)
    lr = rng.random((8, 9, 3, 8, 8)).astype(np.float32)
    hr = rng.random((8, 9, 3, 32, 32)).astype(np.float32)
    return lr, hr


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(4, 2)
    assert mesh2.shape == {"data": 4, "model": 2}
    # multislice/DCN stub: outermost slice axis, batch shards over both
    from tecogan_tpu.parallel.mesh import batch_sharding

    mesh3 = make_mesh(2, 1, n_slice=2)
    assert mesh3.shape == {"slice": 2, "data": 2, "model": 1}
    assert "slice" in str(batch_sharding(mesh3).spec)
    with pytest.raises(ValueError):
        make_mesh(8, 1, n_slice=2)  # 16 devices needed, 8 visible


def test_dp_and_slice_mesh_match_single_device():
    """Default-suite DP numeric guarantee (VERDICT r2 Weak #3): a small
    fixed-mode config (RNN_N=3 — bug_parity's triplet reshape needs 9..11,
    and DP correctness is independent of parity mode) run on 1 device, a
    2-device data mesh, and a (2 slice x 2 data) DCN-stub mesh must agree
    on losses and post-step params."""
    cfg = cfg8(RNN_N=3, batch_size=4, bug_parity=False)
    rng = np.random.default_rng(0)
    lr_np = rng.random((4, 3, 3, 8, 8)).astype(np.float32)
    hr_np = rng.random((4, 3, 3, 32, 32)).astype(np.float32)

    single = cached_train_step(cfg)
    s1 = init_state(cfg, jax.random.PRNGKey(0))
    s1b, m1, _ = single(s1, jnp.asarray(lr_np), jnp.asarray(hr_np))

    for mesh in (make_mesh(2), make_mesh(2, 1, n_slice=2)):
        s2 = replicate_state(mesh, init_state(cfg, jax.random.PRNGKey(0)))
        dp = build_dp_train_step(cfg, mesh, donate=False)
        lr, hr = shard_batch(mesh, lr_np, hr_np)
        s2b, m2, _ = dp(s2, lr, hr)
        np.testing.assert_allclose(
            float(m1["gen_loss"]), float(m2["gen_loss"]), rtol=1e-4,
            err_msg=str(dict(mesh.shape)),
        )
        np.testing.assert_allclose(
            float(m1["d_loss"]), float(m2["d_loss"]), rtol=1e-4)
        diffs = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            s1b.params_g, s2b.params_g,
        )
        assert max(jax.tree.leaves(diffs)) < 1e-5


@pytest.mark.slow
def test_dp_step_runs_sharded(batch8):
    cfg = cfg8()
    mesh = make_mesh(8)
    state = replicate_state(mesh, init_state(cfg, jax.random.PRNGKey(0)))
    step = build_dp_train_step(cfg, mesh, donate=False)
    lr, hr = shard_batch(mesh, *batch8)
    new_state, metrics, gen_out = step(state, lr, hr)
    assert np.isfinite(float(metrics["gen_loss"]))
    assert np.isfinite(float(metrics["d_loss"]))
    # batch outputs stay sharded over data axis
    assert gen_out.shape[0] == 8


@pytest.mark.slow
def test_dp_matches_single_device(batch8):
    """Same math on 8 shards vs 1 device (global-mean losses => identical
    gradients up to float tolerance)."""
    cfg = cfg8()
    lr_np, hr_np = batch8

    single = cached_train_step(cfg)
    s1 = init_state(cfg, jax.random.PRNGKey(0))
    s1b, m1, _ = single(s1, jnp.asarray(lr_np), jnp.asarray(hr_np))

    mesh = make_mesh(8)
    s2 = replicate_state(mesh, init_state(cfg, jax.random.PRNGKey(0)))
    dp = build_dp_train_step(cfg, mesh, donate=False)
    lr, hr = shard_batch(mesh, lr_np, hr_np)
    s2b, m2, _ = dp(s2, lr, hr)

    np.testing.assert_allclose(
        float(m1["gen_loss"]), float(m2["gen_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m1["d_loss"]), float(m2["d_loss"]), rtol=1e-5
    )
    # parameters after one step must agree
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), s1b.params_g, s2b.params_g
    )
    assert max(jax.tree.leaves(diffs)) < 1e-5


@pytest.mark.parametrize(
    "n", [2, pytest.param(8, marks=pytest.mark.slow)]
)
def test_dryrun_multichip(n):
    import __graft_entry__

    __graft_entry__.dryrun_multichip(n)


@pytest.mark.slow
def test_dp_inference_matches_single_device():
    """Scenes sharded over the data axis must produce the same SR frames
    as the single-device clip inference (run_inference's DP path).
    Slow-marked (41s: 8 single-device compiles + the DP compile); the
    default suite still covers DP inference via test_cli_dp_inference_e2e."""
    from tecogan_tpu.engine import build_clip_inference
    from tecogan_tpu.parallel import build_dp_inference
    from tecogan_tpu.parallel.mesh import replicated

    cfg = cfg8(precision="bf16", bug_parity=False)
    state = init_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    clips = rng.random((8, 4, 16, 16, 3)).astype(np.float32)

    single = cached_clip_inference(cfg)
    ref = np.concatenate(
        [np.asarray(single(state.params_g, jnp.asarray(clips[i : i + 1])))
         for i in range(8)]
    )

    mesh = make_mesh(8)
    dp_infer = build_dp_inference(cfg, mesh)
    params_rep = jax.device_put(state.params_g, replicated(mesh))
    batch = shard_batch(mesh, clips)
    got = np.asarray(dp_infer(params_rep, batch))
    assert got.shape == (8, 4, 64, 64, 3)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_cli_dp_inference_e2e(tmp_path):
    """run_inference takes the DP path when several same-shape scenes are
    queued on a multi-device mesh, and writes every clip."""
    import os
    from tecogan_tpu.config import TecoConfig
    from tecogan_tpu.data import write_synthetic_scene_folders
    from tecogan_tpu.cli.main import run_inference
    from tecogan_tpu.engine import init_state
    from tecogan_tpu.utils.checkpoint import save_train_state

    scenes = str(tmp_path / "scenes")
    write_synthetic_scene_folders(scenes, num_scenes=2, frames_per_scene=120,
                                  size=32)
    cfg = TecoConfig(
        crop_size=8, num_resblock=1, discrim_resblocks=1, discrim_channels=16,
        precision="fp32", input_dir_LR=scenes,
        output_dir=str(tmp_path / "out"), data_axis=2,
        g_checkpoint=str(tmp_path / "ckpt" / "generator.ckpt"),
    )
    state = init_state(cfg, jax.random.PRNGKey(0))
    save_train_state(str(tmp_path / "ckpt"), state, epoch=0)
    run_inference(cfg)
    assert os.path.exists(str(tmp_path / "out" / "output0.mp4"))
    assert os.path.exists(str(tmp_path / "out" / "output1.mp4"))


@pytest.mark.slow
def test_tp_channel_sharded_step_matches_single_device(batch8):
    """DP x TP on a (4, 2) mesh: conv kernels sharded over 'model', batch
    over 'data' — the SPMD-propagated step must match the single-device
    step numerically (sharding changes placement, never math).
    Slow-marked (167s: two train-step compiles); the driver contract
    (dryrun_multichip) exercises the DP x TP step on every run."""
    from tecogan_tpu.parallel import build_tp_train_step, shard_state_tp

    cfg = cfg8()
    init = init_state(cfg, jax.random.PRNGKey(0))

    ref_step = cached_train_step(cfg)
    lr, hr = batch8
    ref_state, ref_m, _ = ref_step(init, jnp.asarray(lr), jnp.asarray(hr))

    mesh = make_mesh(4, 2)
    state = shard_state_tp(mesh, init_state(cfg, jax.random.PRNGKey(0)))
    # at least one generator kernel must actually be model-sharded
    shardings = jax.tree.leaves(
        jax.tree.map(lambda x: x.sharding.spec, state.params_g))
    assert any("model" in str(s) for s in shardings), shardings
    tp_step = build_tp_train_step(cfg, mesh, donate=False)
    lr_s, hr_s = shard_batch(mesh, lr, hr)
    tp_state, tp_m, _ = tp_step(state, lr_s, hr_s)

    np.testing.assert_allclose(
        float(tp_m["gen_loss"]), float(ref_m["gen_loss"]), rtol=2e-5)
    np.testing.assert_allclose(
        float(tp_m["d_loss"]), float(ref_m["d_loss"]), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(tp_state.params_g),
                    jax.tree.leaves(ref_state.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
