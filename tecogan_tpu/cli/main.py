"""Train / inference CLI — the reference's public surface
(/root/reference/main.py) on the TPU-native stack.

Same modes and flags (--mode {train,inference}, --inferencetype
{dataset,video}, checkpoints, artifact dumps), with the dead reference
flags made real: --batch_size honored (vs hardcoded 4 at main.py:227),
--rand_seed threaded into jax.random (vs ignored, main.py:34),
--queue_thread wired into the input pipeline (vs ignored, main.py:73,227),
--summary_dir actually receiving per-step metrics (vs unused,
main.py:137-138).  Inference writes every scene's output (the reference's
dedent bug wrote only the last: main.py:220).
"""

from __future__ import annotations

import os
import time

import numpy as np

from ..config import TecoConfig, parse_config


def _jax():
    import jax

    return jax


def run_inference(cfg: TecoConfig) -> None:
    """Reference main.py:141-220: dataset or video input, recurrent SR,
    media output per clip."""
    jax = _jax()
    import jax.numpy as jnp

    from ..data import InferenceDataset, load_video_frames
    from ..engine import build_clip_inference, build_chunked_inference, init_state
    from ..utils.checkpoint import load_generator_params
    from ..ops import save_as_media, MediaWriter

    if cfg.g_checkpoint is None:
        raise ValueError("The checkpoint file is needed to perform the test")

    state = init_state(cfg, jax.random.PRNGKey(cfg.rand_seed))
    params_g = load_generator_params(cfg.g_checkpoint, state.params_g)
    infer = build_clip_inference(cfg)
    qinfer = qtail = None
    if cfg.quantize == "int8":
        from ..engine.inference import build_quantized_clip_inference

        prepare_q, qinfer = build_quantized_clip_inference(cfg)

    if cfg.inferencetype == "dataset":
        ds = InferenceDataset(cfg)
        clips = [ds.get_clip(i) for i in range(len(ds))]
    elif cfg.inferencetype == "video":
        clips = [load_video_frames(cfg.input_dir_LR, cfg.crop_size)]
    else:
        raise ValueError(
            "Invalid data type entered. Please use either video or dataset."
        )

    os.makedirs(cfg.output_dir, exist_ok=True)

    def maybe_adapt(idx, clip):
        """ZSSR test-time adaptation (engine/adapt.py): per-clip params."""
        if cfg.adapt_steps <= 0:
            return params_g
        from ..engine.adapt import adapt_generator

        t0 = time.time()
        adapted, report = adapt_generator(
            cfg, params_g, clip[: max(cfg.adapt_frames, cfg.RNN_N)],
            steps=cfg.adapt_steps, learning_rate=cfg.adapt_lr,
            consistency=cfg.adapt_consistency, guard=True,
        )
        served = "adapted" if report["adapted_served"] else "BASE (guard)"
        print(f"clip {idx}: {cfg.adapt_steps} adapt steps in "
              f"{time.time() - t0:.1f}s; serving {served} — holdout "
              f"{report['base_psnr_db']:.2f} -> {report['chosen_psnr_db']:.2f} dB")
        return adapted

    def maybe_refine(clip, sr_np):
        """Post-hoc LR-consistency back-projection (no training)."""
        if cfg.consistency_refine <= 0:
            return sr_np
        from ..engine.adapt import lr_consistency_refine

        return lr_consistency_refine(sr_np, clip,
                                     iters=cfg.consistency_refine)

    def write_clip(idx, clip, sr_np, dt, n_batched=1):
        out = os.path.join(
            cfg.output_dir, f"{cfg.output_name}{idx}{cfg.videotype}"
        )
        save_as_media(sr_np, out)
        print(
            f"clip {idx}: {clip.shape[0]} frames "
            f"{clip.shape[1]}x{clip.shape[2]} -> 4x in {dt:.2f}s "
            f"({n_batched * clip.shape[0] / dt:.1f} fps"
            f"{' aggregate' if n_batched > 1 else ''}) -> {out}"
        )

    # Spatial sharding: ONE stream's output rows split over the mesh
    # (parallel/spatial.py) — the single-stream fps-scaling axis for
    # >1080p serving (the reference square-resizes input instead,
    # main.py:156).  Exclusive with DP/chunked routing.  Takes the FUSED
    # production path (packed-gather warp, identity-s2d first layer, s2d
    # carry) when the serving config does, incl. the int8 W8A8 tail —
    # bug_parity keeps the exact torch-semantics sharded path.
    if cfg.spatial_shards > 1:
        from ..parallel.mesh import make_mesh
        from ..parallel.spatial import (
            build_spatial_clip_inference, build_spatial_fused_clip_inference,
        )

        n_req = min(cfg.spatial_shards, len(jax.devices()))
        if n_req < cfg.spatial_shards:
            import warnings

            warnings.warn(
                f"--spatial_shards {cfg.spatial_shards} exceeds the "
                f"{len(jax.devices())} visible device(s); clamping.",
                stacklevel=1)
        use_fused_sp = cfg.use_pallas and not cfg.bug_parity
        if qinfer is not None and not use_fused_sp:
            import warnings

            warnings.warn(
                "--quantize int8 requires the fused path (use_pallas, not "
                "bug_parity) under --spatial_shards; serving bf16.",
                stacklevel=1)
        sp_infers = {}
        sp_qtail = None
        for idx, clip in enumerate(clips):
            H = clip.shape[1]
            n_sp = max(n for n in range(1, n_req + 1) if H % n == 0)
            if n_sp == 1:
                import warnings

                warnings.warn(
                    f"clip {idx}: height {H} has no divisor <= {n_req}; "
                    "serving single-device.", stacklevel=1)
                p_clip = maybe_adapt(idx, clip)
                t0 = time.time()
                sr = infer(p_clip, jnp.asarray(clip)[None])
                sr.block_until_ready()
                write_clip(idx, clip, maybe_refine(clip, np.asarray(sr[0])),
                           time.time() - t0)
                continue
            quantized = qinfer is not None and use_fused_sp
            if n_sp not in sp_infers:
                if use_fused_sp:
                    sp_infers[n_sp] = build_spatial_fused_clip_inference(
                        cfg, make_mesh(n_sp), quantize=quantized)
                else:
                    sp_infers[n_sp] = build_spatial_clip_inference(
                        cfg, make_mesh(n_sp))
            p_clip = maybe_adapt(idx, clip)
            t0 = time.time()
            if quantized:
                if sp_qtail is None or cfg.quantize_calib == "per_clip" \
                        or p_clip is not params_g:
                    sp_qtail = prepare_q(p_clip, jnp.asarray(clip[:8])[None])
                sr = sp_infers[n_sp](p_clip, sp_qtail,
                                     jnp.asarray(clip)[None])
            else:
                sr = sp_infers[n_sp](p_clip, jnp.asarray(clip)[None])
            sr.block_until_ready()
            dt = time.time() - t0
            print(f"spatial: {n_sp}-way row sharding"
                  f"{' + int8 tail' if quantized else ''}")
            write_clip(idx, clip, maybe_refine(clip, np.asarray(sr[0])), dt)
        return

    # Data-parallel inference: scenes sharded over the mesh when several
    # same-shape clips are queued and >1 device is visible.
    n_data = cfg.data_axis if cfg.data_axis > 0 else len(jax.devices())
    if n_data > len(jax.devices()):
        import warnings

        warnings.warn(
            f"--data_axis {n_data} exceeds the {len(jax.devices())} visible "
            f"device(s); clamping to {len(jax.devices())}.", stacklevel=1
        )
        n_data = len(jax.devices())
    done = 0
    if n_data > 1 and len(clips) >= n_data and len(
        {c.shape for c in clips}
    ) == 1:
        from ..parallel import make_mesh, build_dp_inference, shard_batch
        from ..parallel.mesh import replicated

        mesh = make_mesh(n_data)
        dp_infer = build_dp_inference(cfg, mesh)
        params_rep = jax.device_put(params_g, replicated(mesh))
        print(f"data-parallel inference over {n_data} devices")
        if cfg.adapt_steps > 0:
            import warnings

            warnings.warn(
                "--adapt_steps is per-clip and is not applied to "
                "DP-batched clips (use --data_axis 1 to adapt each clip).",
                stacklevel=1)
        dp_qinfer = dp_qtail = None
        if qinfer is not None:
            from ..parallel import build_dp_quantized_inference

            prepare_dpq, dp_qinfer = build_dp_quantized_inference(cfg, mesh)
            print("data-parallel int8 serving (qtail replicated)")
        while done + n_data <= len(clips):
            chunk = clips[done : done + n_data]
            t0 = time.time()
            if dp_qinfer is not None:
                if dp_qtail is None or cfg.quantize_calib == "per_clip":
                    # per_clip in DP = per-batch: scales cover every clip
                    # in the stacked batch (max ranges across clips)
                    calib = (np.stack(chunk)[:, :8]
                             if cfg.quantize_calib == "per_clip"
                             else clips[0][None, :8])
                    dp_qtail = prepare_dpq(params_g, jnp.asarray(calib))
                    print(f"int8: activation scales calibrated "
                          f"({cfg.quantize_calib})")
                batch = shard_batch(mesh, np.stack(chunk))
                sr = dp_qinfer(params_rep, dp_qtail, batch)
            else:
                batch = shard_batch(mesh, np.stack(chunk))
                sr = dp_infer(params_rep, batch)
            sr.block_until_ready()
            dt = time.time() - t0
            for j, clip in enumerate(chunk):
                write_clip(done + j, clip, np.asarray(sr[j]), dt,
                           n_batched=n_data)
            done += n_data

    # Long clips stream through fixed windows with the recurrent state
    # carried on device (O(chunk) memory both sides; the one-shot path
    # would materialize T x 4H x 4W x 3 f32 on device — ~23 GB for a
    # 1000-frame 1080p video).  infer_chunk: 0 = auto, -1 = never,
    # >0 = explicit window size.
    def _chunk_for(clip):
        if cfg.infer_chunk < 0:
            return 0
        if cfg.infer_chunk > 0:
            return cfg.infer_chunk
        T, H, W = clip.shape[:3]
        full_bytes = T * (4 * H) * (4 * W) * 3 * 4
        return 64 if full_bytes > (2 << 30) else 0

    chunked = None
    for idx in range(done, len(clips)):
        clip = clips[idx]
        chunk = _chunk_for(clip)
        p_clip = maybe_adapt(idx, clip)
        if p_clip is not params_g and qinfer is not None:
            qtail = None  # adapted params need fresh activation scales
        t0 = time.time()
        if chunk:
            if chunked is None:
                # SR windows come back uint8, converted ON DEVICE —
                # bit-identical to what MediaWriter would write from f32
                # windows (ops.image.transfer_to_uint8), 4x fewer
                # device->host bytes on the dominant transfer.
                chunked = build_chunked_inference(cfg, out_u8=True)
            if qinfer is not None and (
                qtail is None or cfg.quantize_calib == "per_clip"
            ):
                qtail = prepare_q(p_clip, jnp.asarray(clip[:8])[None])
                print("int8: activation scales calibrated on clip "
                      f"{idx} (first 8 frames)")
            if cfg.consistency_refine > 0:
                import warnings

                warnings.warn(
                    "--consistency_refine is not applied on the chunked "
                    "streaming path (windows are written incrementally); "
                    "use --adapt_steps for long clips.", stacklevel=1)
            clip_up = clip[None]
            if cfg.transfer_dtype == "u8":
                # opt-in (exactly like training): 4x fewer upload bytes,
                # LR quantized to the 1/255 grid on the way in
                from ..ops.image import transfer_quantize_u8

                clip_up = transfer_quantize_u8(clip_up)
            out = os.path.join(
                cfg.output_dir, f"{cfg.output_name}{idx}{cfg.videotype}"
            )
            with MediaWriter(out) as w:
                chunked(p_clip, clip_up, chunk=chunk,
                        sink=lambda sr: w.append(sr[0]),
                        qtail=qtail if qinfer is not None else None)
            dt = time.time() - t0
            print(
                f"clip {idx}: {clip.shape[0]} frames "
                f"{clip.shape[1]}x{clip.shape[2]} -> 4x STREAMED"
                f"{' int8' if qinfer is not None else ''} "
                f"(window {chunk}) in {dt:.2f}s "
                f"({clip.shape[0] / dt:.1f} fps) -> {out}"
            )
            continue
        if qinfer is not None:
            if qtail is None or cfg.quantize_calib == "per_clip":
                qtail = prepare_q(p_clip, jnp.asarray(clip)[None])
                print("int8: activation scales calibrated on clip "
                      f"{idx} (first 8 frames)")
            sr = qinfer(p_clip, qtail, jnp.asarray(clip)[None])
        else:
            sr = infer(p_clip, jnp.asarray(clip)[None])
        sr.block_until_ready()
        dt = time.time() - t0
        write_clip(idx, clip, maybe_refine(clip, np.asarray(sr[0])), dt)


def _host_rss_gb() -> float:
    """This process's resident set size in GB (Linux /proc)."""
    try:
        with open("/proc/self/status") as f:
            return int(f.read().split("VmRSS:")[1].split()[0]) / (1 << 20)
    except (OSError, IndexError, ValueError):
        return 0.0


_STOP_REQUESTED: list = []


def request_graceful_stop(signum=None, frame=None) -> None:
    """SIGTERM handler: ask the train loop to checkpoint and exit at the
    next step boundary (preemption / driver-window friendly — an
    uncheckpointed kill can lose up to checkpoint_every epochs)."""
    _STOP_REQUESTED.append(signum or True)


def run_train(cfg: TecoConfig) -> None:
    """Reference main.py:223-320: epoch loop with per-epoch artifacts,
    LR decay, and checkpoints — one jitted (optionally data-parallel)
    step per batch."""
    jax = _jax()
    import jax.numpy as jnp

    from ..data import TrainDataset, make_input_pipeline
    from ..engine import init_state, build_train_step, set_epoch
    from ..parallel import (
        make_mesh,
        build_dp_train_step,
        replicate_state,
        batch_sharding,
    )
    from ..utils import (
        SummaryWriter,
        format_metrics,
        save_epoch_artifacts,
        save_train_state,
        load_train_state,
    )

    dataset = TrainDataset(cfg)
    if len(dataset) == 0:
        raise ValueError("no eligible scenes found under input_video_dir")
    print(f"dataset: {len(dataset.scenes)} scenes, "
          f"{len(dataset)} samples/epoch"
          + (" (bug_parity sampling: scene-count __len__, "
             "dataloader.py:78-79)" if cfg.bug_parity else ""))

    # VGG perceptual loss (off unless vgg_scaling > 0; the reference's
    # --vgg_ckpt was parsed but never loaded, main.py:69)
    vgg_apply = None
    if cfg.vgg_scaling > 0.0:
        from ..models.vgg import vgg19_features, load_vgg_params

        if not cfg.vgg_ckpt:
            raise ValueError(
                "--vgg_scaling > 0 requires --vgg_ckpt (a converted VGG-19 "
                "checkpoint, or the literal 'surrogate' for fixed-seed "
                "random-feature weights)"
            )
        vgg_params = load_vgg_params(cfg.vgg_ckpt)
        if cfg.vgg_ckpt == "surrogate":
            print("VGG loss: fixed-seed SURROGATE weights (no pretrained "
                  "VGG-19 available offline)")

        def vgg_apply(images01_nhwc, deep_list):
            return vgg19_features(vgg_params, images01_nhwc, deep_list)

    state = init_state(cfg, jax.random.PRNGKey(cfg.rand_seed))

    devices = jax.devices()
    n_data = cfg.data_axis if cfg.data_axis > 0 else len(devices)
    if n_data > len(devices):
        import warnings

        warnings.warn(
            f"--data_axis {n_data} exceeds the {len(devices)} visible "
            f"device(s); clamping to {len(devices)}.", stacklevel=1
        )
        n_data = len(devices)
    use_dp = n_data > 1 and cfg.batch_size % n_data == 0
    k_dispatch = max(1, cfg.steps_per_dispatch)
    if cfg.steps_per_epoch > 0 and k_dispatch > cfg.steps_per_epoch:
        import warnings

        warnings.warn(
            f"--steps_per_dispatch {k_dispatch} exceeds --steps_per_epoch "
            f"{cfg.steps_per_epoch}; clamping to the epoch cap so the first "
            "dispatch cannot overrun it.", stacklevel=1
        )
        k_dispatch = cfg.steps_per_epoch
        cfg = cfg.replace(steps_per_dispatch=k_dispatch)
    sharding = None
    if use_dp:
        mesh = make_mesh(n_data)
        if k_dispatch > 1:
            from ..parallel import build_dp_multi_train_step

            step_fn = build_dp_multi_train_step(cfg, mesh, vgg_apply=vgg_apply)
        else:
            step_fn = build_dp_train_step(cfg, mesh, vgg_apply=vgg_apply)
        state = replicate_state(mesh, state)
        sharding = batch_sharding(mesh)
        print(f"data-parallel over {n_data} devices")
    else:
        if n_data > 1:
            import warnings

            warnings.warn(
                f"batch_size={cfg.batch_size} is not divisible by "
                f"{n_data} devices — falling back to SINGLE-device "
                f"training ({n_data - 1} devices idle). Pick a batch size "
                f"divisible by the device count to enable data parallelism.",
                stacklevel=1,
            )
        if k_dispatch > 1:
            from ..engine import build_multi_train_step

            step_fn = build_multi_train_step(cfg, vgg_apply=vgg_apply)
        else:
            step_fn = build_train_step(cfg, vgg_apply=vgg_apply)
    if k_dispatch > 1:
        print(f"{k_dispatch} steps per dispatch (scanned in-device)")

    from ..utils.checkpoint import has_checkpoint, wait_for_async_save

    current_epoch = 0
    if cfg.pre_trained_model:
        state, current_epoch = load_train_state(
            cfg.output_dir, state, cfg.g_checkpoint, cfg.d_checkpoint
        )
        print(f"resumed from epoch {current_epoch}")
    elif cfg.auto_resume and has_checkpoint(cfg.output_dir):
        state, current_epoch = load_train_state(cfg.output_dir, state)
        print(f"auto-resumed from epoch {current_epoch}")

    # validation split: scenes end_dir+1 .. end_dir_val (the reference
    # parsed --end_dir_val but never used it; SURVEY §5 config row)
    val_dataset = None
    val_infer = None
    if cfg.validate_every > 0:
        val_cfg = cfg.replace(str_dir=cfg.end_dir + 1, end_dir=cfg.end_dir_val)
        try:
            val_dataset = TrainDataset(val_cfg)
            if len(val_dataset) == 0:
                val_dataset = None
        except ValueError:
            val_dataset = None
        if val_dataset is not None:
            from ..engine import build_clip_inference
            from ..ops.metrics import psnr

            val_infer = build_clip_inference(cfg)
            print(f"validation: {len(val_dataset.scenes)} scenes")

    def run_validation(params_g):
        scores = []
        for s in range(len(val_dataset.scenes)):
            lr_clip, hr_clip = val_dataset.get_clip(s * 110)
            # transpose on host; upload u8 when --transfer_dtype u8 (the
            # remote client leaks host memory per transferred byte —
            # DESIGN.md) and deprocess on device
            lr_nhwc = np.transpose(lr_clip, (0, 2, 3, 1))[None]
            if cfg.transfer_dtype == "u8":
                from ..ops.image import (
                    transfer_dequantize_f32, transfer_quantize_u8,
                )

                lr_dev = transfer_dequantize_f32(
                    jnp.asarray(transfer_quantize_u8(lr_nhwc)))
            else:
                lr_dev = jnp.asarray(lr_nhwc)
            sr = np.asarray(val_infer(params_g, lr_dev)[0])
            # PSNR on host: uploading the f32 HR clips costs ~24 MB per
            # scene per validation through the leaking transfer path
            hr_nhwc = np.transpose(hr_clip, (0, 2, 3, 1))
            mse = float(np.mean((hr_nhwc - sr) ** 2))
            scores.append(10.0 * float(np.log10(1.0 / max(mse, 1e-12))))
        return float(np.mean(scores))

    import signal

    try:
        _prev_term = signal.signal(signal.SIGTERM, request_graceful_stop)
    except ValueError:  # not the main thread (embedded use) — no handler
        _prev_term = None

    writer = SummaryWriter(cfg.summary_dir)
    since = time.time()
    log_keys = [
        "gen_loss", "d_loss", "l2_content_loss", "t_adversarial_loss",
        "t_discrim_real_output", "t_discrim_fake_output", "learning_rate",
    ]

    try:
        for epoch in range(current_epoch, cfg.max_epochs):
            state = set_epoch(state, epoch)
            g_loss = d_loss = 0.0
            raw_batches = dataset.batches(
                cfg.batch_size, shuffle=True, seed=cfg.rand_seed + epoch,
                workers=cfg.queue_thread,
            )
            if cfg.transfer_dtype == "u8":
                # upload uint8, deprocess on device (engine/train.py):
                # 4x fewer tunnel bytes + 4x less host memory lost to the
                # remote client's per-transfer leak (DESIGN.md)
                from ..ops.image import transfer_quantize_u8

                def _to_u8(it):
                    for lr_b, hr_b in it:
                        yield (
                            transfer_quantize_u8(lr_b),
                            transfer_quantize_u8(hr_b),
                        )

                raw_batches = _to_u8(raw_batches)
            epoch_sharding = sharding
            if k_dispatch > 1:
                # stack K HOST batches per dispatch BEFORE the device-prefetch
                # stage (one upload per group; grouping after it would bounce
                # each batch device->host->device).  A trailing partial group
                # is dropped like DataLoader drop_last.
                def _grouped(it, k):
                    buf = []
                    for item in it:
                        buf.append(item)
                        if len(buf) == k:
                            yield (np.stack([b[0] for b in buf]),
                                   np.stack([b[1] for b in buf]))
                            buf = []

                raw_batches = _grouped(raw_batches, k_dispatch)
                if use_dp:
                    from ..parallel import multi_batch_sharding

                    epoch_sharding = multi_batch_sharding(mesh)
            batches = make_input_pipeline(
                raw_batches,
                queue_threads=cfg.queue_thread,
                prefetch=cfg.prefetch,
                sharding=epoch_sharding,
            )
            n_batches = 0
            lr_np = hr_np = gen_out = None
            g_vals, d_vals = [], []
            trace_active = False
            for batch_idx, (lr_np, hr_np) in enumerate(batches):
                # profiling window (SURVEY.md §5 tracing row): dispatches
                # 10-15 of the first profiled epoch land in --profile_dir
                # (steps 10K-15K when steps_per_dispatch K > 1)
                if cfg.profile_dir and epoch == current_epoch and batch_idx == 10:
                    jax.profiler.start_trace(cfg.profile_dir)
                    trace_active = True
                state, metrics, gen_out = step_fn(
                    state, jnp.asarray(lr_np), jnp.asarray(hr_np)
                )
                if trace_active and batch_idx >= 15:
                    jax.block_until_ready(state)
                    jax.profiler.stop_trace()
                    trace_active = False
                # Keep loss scalars ON DEVICE here: a float() per step forces a
                # host sync that serializes the async dispatch queue (fatal
                # over a remote-TPU link — one round-trip per step); the epoch
                # running means (main.py:280-282) are materialized once below.
                g_vals.append(metrics["gen_loss"])
                d_vals.append(metrics["d_loss"])
                n_batches += k_dispatch
                if cfg.log_every and batch_idx % cfg.log_every == 0:
                    log_m = metrics
                    if k_dispatch > 1:  # metrics carry a leading K dim
                        log_m = {k: v[-1] for k, v in metrics.items()}
                    writer.write(int(state.step), log_m, epoch=epoch)
                if _STOP_REQUESTED:
                    break
                if cfg.steps_per_epoch > 0 and (
                    n_batches + k_dispatch > cfg.steps_per_epoch
                ):
                    # stop while still <= the cap (at K>1 the cap rounds
                    # DOWN to a whole number of dispatches)
                    break
            if trace_active:  # loop ended inside the profiling window
                jax.block_until_ready(state)
                jax.profiler.stop_trace()
            if _STOP_REQUESTED:
                save_train_state(cfg.output_dir, jax.device_get(state), epoch,
                                 async_save=False)
                print(f"SIGTERM: checkpointed epoch {epoch} after {n_batches} "
                      "steps, exiting cleanly")
                break
            if n_batches == 0:
                hint = (
                    f"steps_per_dispatch={k_dispatch} exceeds the "
                    f"{len(dataset) // max(cfg.batch_size, 1)} batches this "
                    "dataset yields per epoch" if k_dispatch > 1
                    else "batch_size larger than dataset?"
                )
                raise ValueError(f"empty epoch: {hint}")
            g_loss = float(np.mean(np.concatenate(
                [np.atleast_1d(np.asarray(v)) for v in jax.device_get(g_vals)])))
            d_loss = float(np.mean(np.concatenate(
                [np.atleast_1d(np.asarray(v)) for v in jax.device_get(d_vals)])))
            if k_dispatch > 1:  # epoch-end reporting uses the last step's row
                metrics = {k: v[-1] for k, v in metrics.items()}

            # per-epoch artifacts (main.py:283-294); with K-step dispatch the
            # held batch is (K, B, ...) — the artifacts show the last step's
            os.makedirs(cfg.output_dir, exist_ok=True)
            if k_dispatch > 1:
                lr_np = np.asarray(lr_np)[-1]
                hr_np = np.asarray(hr_np)[-1]
            rng = np.random.default_rng(cfg.rand_seed + epoch)
            save_epoch_artifacts(
                cfg.output_dir,
                np.asarray(gen_out),
                np.asarray(hr_np),
                np.asarray(lr_np),
                cfg.RNN_N,
                sample_index=int(rng.integers(0, len(np.asarray(hr_np)))),
            )

            print(f"Epoch: {epoch + 1}")
            print(f"Generator loss is: {g_loss}\nDiscriminator loss is: {d_loss}")
            lr_now = float(metrics["learning_rate"])
            print(f"Generator lr is: {lr_now}, Discriminator lr is: {lr_now}")
            print(format_metrics({k: metrics[k] for k in log_keys if k in metrics}))

            if val_dataset is not None and (epoch + 1) % cfg.validate_every == 0:
                val_psnr = run_validation(state.params_g)
                writer.write(int(state.step), {"val_psnr_db": val_psnr}, epoch=epoch)
                print(f"Validation PSNR: {val_psnr:.3f} dB")

            if (epoch + 1) % cfg.checkpoint_every == 0:
                save_train_state(
                    cfg.output_dir, jax.device_get(state), epoch,
                    async_save=cfg.async_checkpoint,
                )
                print("Saving model...")

            elapsed = time.time() - since
            print(f"Training time {elapsed // 60:.0f}m {elapsed % 60:.0f}s",
                  flush=True)  # epoch summaries must survive redirected logs

            # RSS watchdog (failure detection/recovery): remote-TPU
            # clients can leak host memory per H2D transfer (measured
            # ~1.3x the transfer size on the axon client, DESIGN.md) —
            # unbounded training would end in an un-checkpointed OOM
            # kill.  Checkpoint and hand control to the supervisor loop
            # (exit 75 = EX_TEMPFAIL; tools/run_convergence_r3.sh
            # restarts, --auto_resume continues the run).
            if cfg.rss_limit_gb > 0 and _host_rss_gb() > cfg.rss_limit_gb:
                # epoch + 1: this epoch is COMPLETE, so the supervisor
                # restart must continue at the next one.  (The normal
                # checkpoint_every save keeps the reference's semantics —
                # main.py:308 stores `epoch: e` and resume re-trains e —
                # but the watchdog fires every restart; re-training one
                # epoch per restart could make zero forward progress if
                # the leak crosses the limit within a single epoch.)
                save_train_state(cfg.output_dir, jax.device_get(state),
                                 epoch + 1, async_save=False)
                writer.close()
                print(f"RSS {_host_rss_gb():.1f} GB > limit "
                      f"{cfg.rss_limit_gb:g} GB: checkpointed through epoch "
                      f"{epoch}, exiting 75 for supervisor restart",
                      flush=True)
                raise SystemExit(75)
        wait_for_async_save()
        writer.close()
    finally:
        # always clear the stop flag and restore the previous
        # SIGTERM handler, even on exceptions — a leaked flag makes
        # the NEXT run_train in this process exit after one step
        _STOP_REQUESTED.clear()
        if _prev_term is not None:
            signal.signal(signal.SIGTERM, _prev_term)


def main(argv=None) -> None:
    cfg = parse_config(argv)

    if cfg.output_dir is None:
        raise ValueError("The output directory is needed")
    os.makedirs(cfg.output_dir, exist_ok=True)
    os.makedirs(cfg.summary_dir, exist_ok=True)

    if cfg.mode == "inference":
        run_inference(cfg)
    elif cfg.mode == "train":
        run_train(cfg)
    else:
        raise ValueError(f"unknown --mode {cfg.mode!r} (train or inference)")


if __name__ == "__main__":
    main()
