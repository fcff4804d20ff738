#!/bin/bash
# Round-3c chain: wait for the doom_main shard generation
# (scripts/doom_main_gen_r3c.sh, running detached, log /tmp/doom_gen.log)
# to finish + merge, then run suite A (reference 50k+50k budget at k=8 on
# all 10k programs + baselines) and suite B (k=15 on the 5k subset view).
# If the generator dies without the done marker (log stale >5 min), its
# idempotent script is relaunched. Detach me with setsid; kill via
# /tmp/doom_chain.pid only.
set -x
cd /root/repo
GEN_LOG=/tmp/doom_gen.log
while ! grep -q "DOOM MAIN GEN R3C DONE" "$GEN_LOG"; do
  age=$(( $(date +%s) - $(stat -c %Y "$GEN_LOG") ))
  # relaunch only if the log is LONG stale AND no generator/merge process
  # is alive (merge logs once per ~2 min shard copy; a concurrent second
  # merge would corrupt the output) — pgrep is a read-only check here
  if [ "$age" -gt 900 ] && ! pgrep -f "vizdoom_generator_cli|data.merge_datasets" > /dev/null; then
    echo "generator dead and log stale ${age}s — relaunching idempotent gen script"
    bash scripts/doom_main_gen_r3c.sh >> "$GEN_LOG" 2>&1
  fi
  sleep 60
done
# reclaim ~34 GB before the suites' device-cache sidecars are built
# (only once the merged output is verifiably complete)
if [ "$(wc -l < datasets/doom_main/id.txt)" -eq 10400 ]; then
  rm -rf datasets/doom_main_shard_len8_seed123 datasets/doom_main_shard_len8_seed234 \
         datasets/doom_main_shard_len8_seed345 datasets/doom_main_shard_len8_seed456
fi
bash scripts/doom_main_r3b.sh > /tmp/doom_r3b.log 2>&1
bash scripts/doom_main_k15_sub.sh > /tmp/doom_k15.log 2>&1
echo "DOOM MAIN CHAIN R3C DONE"
