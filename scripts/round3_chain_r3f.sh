#!/bin/bash
# Round-3f queue (replaces round3_chain_r3e.sh, whose watcher process died
# before suite B finished): once suite B (/tmp/doom_k15.log) releases the
# TPU, run suite C (k=25 subset view, scripts/doom_main_k25_sub.sh), then
# the Karel per-k ablation retrains (scripts/karel_k_ablation.sh;
# datasets/karel_25k already regenerated). Launch detached:
#   setsid nohup bash scripts/round3_chain_r3f.sh > /tmp/r3f_chain.log 2>&1 &
#   echo $! > /tmp/r3f_chain.pid
# No pgrep-by-pattern anywhere: liveness is tracked via PID files only.
set -x
cd /root/repo
CHAIN_PID=$(cat /tmp/doom_chain.pid 2>/dev/null || echo 0)
while true; do
  grep -q "DOOM MAIN K15 SUBSET SUITE DONE" /tmp/doom_k15.log 2>/dev/null && break
  if ! kill -0 "$CHAIN_PID" 2>/dev/null; then
    # the chain bash is gone; its last child (stage runner or evaler) may
    # still hold the TPU — give the log 10 quiet minutes before proceeding
    last_mtime=$(stat -c %Y /tmp/doom_k15.log 2>/dev/null || echo 0)
    now=$(date +%s)
    if [ $((now - last_mtime)) -ge 600 ]; then
      echo "doom chain gone and k15 log quiet for 10 min - TPU is free"
      break
    fi
  fi
  sleep 120
done
bash scripts/doom_main_k25_sub.sh > /tmp/doom_k25.log 2>&1
if ! grep -q "dataset generated under" /tmp/karel_gen.log 2>/dev/null \
   && [ ! -f datasets/karel_25k/data.hdf5 ]; then
  echo "karel_25k missing - skipping ablation"
  exit 1
fi
bash scripts/karel_k_ablation.sh > /tmp/karel_ablation.log 2>&1
echo "ROUND3F CHAIN DONE"
