#!/bin/bash
# Round-3i chain (fresh VM after the mid-round wipe: datasets, train_dirs,
# and compile cache are all gone; every result in RESULTS.md survives in
# git but the artifacts must be rebuilt).
#   1. wait for datasets/karel_25k regeneration (/tmp/karel_gen.log)
#   2. scripts/karel_k_ablation.sh — the last unmatched published table
#      (per-k retrained synthesis/summarizer at k=3/5), 4x 30k-step
#      trains + evals, auto-resume safe
# Doom 4-shard regeneration runs nice-19 alongside (launched separately
# once the ablation's baseline sec/batch is measured); suite C (k=25)
# is sized adaptively afterwards.
# Launch detached:
#   setsid nohup bash scripts/round3_chain_r3i.sh \
#       > /tmp/r3i_chain.log 2>&1 < /dev/null &
set -x
echo $$ > /tmp/r3i_chain.pid
cd /root/repo
waited=0
while ! grep -q "dataset generated under" /tmp/karel_gen.log 2>/dev/null; do
  if [ "$waited" -ge 3600 ]; then
    echo "karel_25k generation never finished - aborting"
    exit 1
  fi
  sleep 30; waited=$((waited + 30))
done
bash scripts/karel_k_ablation.sh > /tmp/karel_ablation.log 2>&1
echo "ROUND3I CHAIN DONE"
