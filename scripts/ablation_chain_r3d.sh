#!/bin/bash
# Round-3d watcher: once the doom_main chain (suite A /tmp/doom_r3b.log +
# suite B /tmp/doom_k15.log) has fully released the TPU, run the Karel
# per-k ablation retrains (scripts/karel_k_ablation.sh — the remaining
# half of VERDICT r2 next-round #3: models TRAINED at k=3/5, matching the
# reference's per-k protocol, README.md:153-158). Needs datasets/karel_25k,
# which is regenerating in the background (/tmp/karel_gen.log).
# Detach with setsid; kill via /tmp/ablation_chain.pid only.
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
# wait (up to 2h) for the karel_25k regeneration to land
waited=0
while ! grep -q "dataset generated under" /tmp/karel_gen.log 2>/dev/null; do
  if [ "$waited" -ge 7200 ]; then
    echo "karel_25k generation never finished - aborting ablation chain"
    exit 1
  fi
  sleep 60; waited=$((waited + 60))
done
bash scripts/karel_k_ablation.sh > /tmp/karel_ablation.log 2>&1
echo "KAREL ABLATION CHAIN R3D DONE"
