#!/bin/bash
# Round-3e queue (replaces ablation_chain_r3d.sh): after suite B
# (/tmp/doom_k15.log) releases the TPU, run suite C (k=25 subset view,
# scripts/doom_main_k25_sub.sh), then the Karel per-k ablation retrains
# (scripts/karel_k_ablation.sh; needs datasets/karel_25k, regenerating in
# /tmp/karel_gen.log). Detach with setsid; kill via /tmp/r3e_chain.pid.
set -x
cd /root/repo
CHAIN_PID=$(cat /tmp/doom_chain.pid 2>/dev/null || echo 0)
while true; do
  grep -q "DOOM MAIN K15 SUBSET SUITE DONE" /tmp/doom_k15.log 2>/dev/null && break
  # fallback: chain bash dead AND no runner/evaler child alive -> TPU free
  if ! kill -0 "$CHAIN_PID" 2>/dev/null \
     && ! pgrep -f "doom_stage_runner|evaler_cli" > /dev/null; then
    echo "doom chain gone without k15 marker - proceeding (TPU is free)"
    break
  fi
  sleep 120
done
bash scripts/doom_main_k25_sub.sh > /tmp/doom_k25.log 2>&1
# wait (up to 1h more) for the karel_25k regeneration to land
waited=0
while ! grep -q "dataset generated under" /tmp/karel_gen.log 2>/dev/null; do
  if [ "$waited" -ge 3600 ]; then
    echo "karel_25k generation never finished - skipping ablation"
    exit 1
  fi
  sleep 60; waited=$((waited + 60))
done
bash scripts/karel_k_ablation.sh > /tmp/karel_ablation.log 2>&1
echo "ROUND3E CHAIN DONE"
