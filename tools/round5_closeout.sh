#!/bin/bash
# Round-5 close-out: run AFTER stopping the convergence supervisor.
# Publishes every round-5 eval artifact from the final checkpoint, then
# the serving benchmarks.  Each step logs and keeps going on failure so
# one flaky tunnel call cannot void the round's evidence.
#
# Every chip-touching step is bounded with `timeout`: the remote-TPU
# tunnel is single-tenant and a wedged grant blocks a client forever
# with no error.  Killing a wedged client re-wedges the grant for the
# server-side claim timeout (~12-19 min observed), so the bounds are
# generous — they exist to keep ONE stuck step from eating the whole
# close-out window, not to be hit in a healthy run.
set -x
DATA=${DATA:-/root/data_r4/scenes}
RUN=${RUN:-/root/data_r4/run1}
note=${NOTE:-"round-5 resumed convergence run (tools/run_convergence_r5.sh)"}

date
# 1. synthetic held-out eval + trajectory + wall train-MFU
timeout -s TERM 1200 python tools/publish_round_eval.py --run_dir "$RUN" --scene_dir "$DATA" \
  --out eval/synthetic_eval_r5.json --context_note "$note" || true

date
# 2. real-content eval from the converged checkpoint (base + int8 +
#    guarded ZSSR) — overwrites the epoch-41 interim records
timeout -s TERM 2100 python tools/real_eval.py --g_checkpoint "$RUN/generator.ckpt" \
  --int8 --adapt 1000 --json_out eval/real_eval_r5.json || true

date
# 3. few-shot _ft rows from the converged checkpoint (fresh ft_run dir so
#    the fine-tune starts from THIS checkpoint, not a stale one)
rm -rf /root/data_r5_ft_final
timeout -s TERM 1500 python tools/finetune_real.py --base_dir "$RUN" \
  --out_dir /root/data_r5_ft_final --epochs 8 --eval \
  --json_out eval/real_eval_r5.json || true

date
# 4. claims gate must be green on the final artifacts
python tools/check_claims.py || true

date
# 5. serving benchmarks (headline + multi-stream)
timeout -s TERM 900 python bench.py || true
timeout -s TERM 900 python tools/bench_serving.py 1 2 4 || true
date
