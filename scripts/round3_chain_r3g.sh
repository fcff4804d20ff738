#!/bin/bash
# Round-3g queue: sequential re-run of the remaining round-3 experiment
# queue after the suite-B trainer wedged on a hung device RPC at step 30.7k
# (killed by PID; trainer auto-resume restores s1 from ckpt 30001).
#   1. suite B  (doom_main 5k-subset @ k=15) — scripts/doom_main_k15_sub.sh
#   2. suite C  (doom_main 2.5k-subset @ k=25 + baselines + beam-10) —
#      scripts/doom_main_k25_sub.sh
#   3. Karel per-k ablation retrains — scripts/karel_k_ablation.sh
# Owns the whole queue (no watcher). Launch detached:
#   setsid nohup bash scripts/round3_chain_r3g.sh > /tmp/r3g_chain.log 2>&1 &
set -x
echo $$ > /tmp/r3g_chain.pid
cd /root/repo
bash scripts/doom_main_k15_sub.sh > /tmp/doom_k15_b.log 2>&1
bash scripts/doom_main_k25_sub.sh > /tmp/doom_k25.log 2>&1
bash scripts/karel_k_ablation.sh > /tmp/karel_ablation.log 2>&1
echo "ROUND3G CHAIN DONE"
