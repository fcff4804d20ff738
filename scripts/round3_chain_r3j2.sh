#!/bin/bash
# Round-3j2 chain (replaces round3_chain_r3j.sh, which queued the
# full-model-only suite): after the per-k Karel extension (TPU) and the
# doom_main 4-shard regeneration (CPU, nice-19) BOTH finish, launch
# suite C WITH the synthesis/induction baselines
# (scripts/doom_main_k25_r3j.sh).
# Launch detached:
#   setsid nohup bash scripts/round3_chain_r3j2.sh \
#       > /tmp/r3j2_chain.log 2>&1 < /dev/null &
set -x
echo $$ > /tmp/r3j2_chain.pid
cd /root/repo
waited=0
until grep -q "K ABLATION EXT DONE" /tmp/karel_ext.log 2>/dev/null \
   && grep -q "DOOM MAIN GEN R3C DONE" /tmp/doom_gen_r3j.log 2>/dev/null; do
  if [ "$waited" -ge 21600 ]; then
    echo "prerequisites never finished after 6h - aborting"
    exit 1
  fi
  sleep 60; waited=$((waited + 60))
done
date +%s
bash scripts/doom_main_k25_r3j.sh > /tmp/doom_k25.log 2>&1
echo "ROUND3J2 CHAIN DONE"
