#!/bin/bash
# Round-3 BASELINE-scale convergence run (VERDICT r2 next-round #7).
#
# Dataset: 408 synthetic variety training scenes (1000-1407) + 12
# validation scenes (1408-1419) + 3 held-out eval scenes (2100-2102),
# 120 frames each at 144x144 — generated with
# tecogan_tpu.data.synthetic.write_synthetic_scene_folders(variety=True,
# seed_offset=...) (UCF101 itself is not downloadable here: zero egress).
#
# Config: the reference's training shape (crop 32->128, RNN 10, batch 4,
# Adam 1e-4, StepLR 250/0.8) with the FULL loss stack enabled — fixed
# mode (bug_parity False: gradients actually flow through the
# adversarial + feature-matching terms), ping-pong, VGG-surrogate
# perceptual. steps_per_epoch caps an epoch at 150 steps so epoch
# granularity matches the reference's (408-sample epochs ~= 102 steps).
#
# Resume-safe THREE ways (failure detection/recovery, SURVEY §5):
#  * per-2-epoch checkpoints + --auto_resume; SIGTERM checkpoints and
#    exits cleanly;
#  * --transfer_dtype u8 cuts H2D bytes 4x (the axon remote-TPU client
#    leaks host memory per transferred byte — DESIGN.md);
#  * --rss_limit_gb + this supervisor loop: the trainer checkpoints and
#    exits 75 before the leak reaches the OOM killer, and is relaunched
#    (the round-3 run died at 129 GB RSS without this).
DATA=${DATA:-/root/data_r4/scenes}
OUT=${OUT:-/root/data_r4/run1}
while true; do
  python -u main.py \
    --mode train \
    --input_video_dir "$DATA" \
    --str_dir 1000 --end_dir 1407 --end_dir_val 1419 \
    --batch_size 4 --crop_size 32 --RNN_N 10 \
    --num_resblock 16 --discrim_resblocks 4 --discrim_channels 128 \
    --precision bf16 --bug_parity False \
    --pingpang True --vgg_scaling 0.2 --vgg_ckpt surrogate \
    --max_epochs ${MAX_EPOCHS:-2000} --steps_per_epoch 150 \
    --checkpoint_every 2 --validate_every 4 \
    --auto_resume True --queue_thread 6 \
    --log_every 50 \
    --transfer_dtype u8 --rss_limit_gb ${RSS_LIMIT_GB:-80} \
    --output_dir "$OUT" --summary_dir "$OUT/summary"
  code=$?
  if [ "$code" -ne 75 ]; then
    echo "trainer exited $code — supervisor done"
    exit $code
  fi
  echo "trainer exited 75 (RSS limit) — restarting with auto-resume"
done
