#!/bin/bash
# Round-3 pending-on-TPU queue — run when the remote-TPU tunnel is back
#
# STATUS (2026-08-19, tunnel returned): items 1-3 DONE — results in
# DESIGN.md "Pending-on-TPU queue results" (38.0 fps sanity; int8
# 41.81 fps / 1.099x; serving 38.0/36.2/35.7 at B=1/2/4).  Item 4
# (convergence resume) is NOT possible after a VM reset: /root/data_r3
# (dataset + checkpoints) does not survive; the epoch-108 results live
# in eval/synthetic_eval_r3.json.  A fresh run needs the dataset
# regenerated first (tecogan_tpu.data.synthetic, see run script).
# (probe first: `timeout 90 python -c "import jax; print(jax.devices())"`;
# jax.devices() HANGS with no error while the tunnel is down, so never
# call it inline in a session).
#
# Order matters: short benches first (minutes), the convergence-run
# resume last (open-ended; stop it before the round's driver bench needs
# the chip).
set -x
cd "$(dirname "$0")/.."

# 1. Headline bench sanity (38.0 fps/chip expected; BENCH_r03 anchor).
timeout 900 python bench.py

# 2. int8 W8A8 serving A/B vs bf16 (tool ready since the quant work;
#    fps side of eval/real_eval_r3.json's -0.01 dB fidelity rows).
timeout 1200 python tools/bench_quant.py

# 3. Batched multi-stream serving throughput (aggregate fps at B=1/2/4;
#    the reference serves exactly one stream).
timeout 1800 python tools/bench_serving.py 1 2 4

# 4. Resume the 408-scene convergence run (epoch ~109 -> onward) under
#    the RSS-watchdog supervisor. Stop with SIGTERM (graceful checkpoint)
#    before the round ends so the driver's bench.py gets the TPU.
# MAX_EPOCHS=400 RSS_LIMIT_GB=80 bash tools/run_convergence_r3.sh
