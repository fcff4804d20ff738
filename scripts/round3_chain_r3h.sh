#!/bin/bash
# Round-3h queue (replaces the tail of round3_chain_r3g.sh, whose chain
# shell was killed by PID; suite B's own sub-shell 17024 keeps running).
# Reordered so the Karel per-k ablation — the last unmatched published
# reference table — lands BEFORE the long doom suite C:
#   1. wait for suite B (doom_main 5k @ k=15) to finish: DONE marker in
#      /tmp/doom_k15_b.log, or its sub-shell PID gone (PID passed as $1)
#   2. scripts/karel_k_ablation.sh   (4x 30k-step karel trains + evals)
#   3. scripts/doom_main_k25_sub.sh  (suite C: 2.5k @ k=25 + baselines)
# Launch detached:
#   setsid nohup bash scripts/round3_chain_r3h.sh <suiteB_pid> \
#       > /tmp/r3h_chain.log 2>&1 < /dev/null &
set -x
echo $$ > /tmp/r3h_chain.pid
cd /root/repo
SUITE_B_PID=${1:-0}
while true; do
  grep -q "DOOM MAIN K15 SUBSET SUITE DONE" /tmp/doom_k15_b.log 2>/dev/null && break
  if ! kill -0 "$SUITE_B_PID" 2>/dev/null; then
    echo "suite B sub-shell gone without marker - proceeding (TPU free)"
    break
  fi
  sleep 120
done
bash scripts/karel_k_ablation.sh > /tmp/karel_ablation.log 2>&1
bash scripts/doom_main_k25_sub.sh > /tmp/doom_k25.log 2>&1
echo "ROUND3H CHAIN DONE"
