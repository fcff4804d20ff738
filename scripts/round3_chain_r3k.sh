#!/bin/bash
# Round-3k master chain — fully idempotent from a FRESH VM (the wipes keep
# destroying datasets/ and train_dir/; everything this script needs lives
# in git). Relaunch it after any restart and it continues where it died:
#   0. regenerate datasets/karel_25k (seed 123, bit-identical) if missing
#   1. fork the doom_main 4-shard regeneration (CPU, nice-19, idempotent)
#   2. Karel per-k constant-LR ablation on the TPU (skips finished combos)
#   3. wait for the doom shards + merge
#   4. doom_main k=25 suite C (stage runner skips finished stages)
# Launch detached:
#   setsid nohup bash scripts/round3_chain_r3k.sh \
#       > /tmp/r3k_chain.log 2>&1 < /dev/null &
set -x
echo $$ > /tmp/r3k_chain.pid
cd /root/repo

# ---- stage 0: karel_25k (25k/5k/5k -> 35,000 ids) ----
if ! [ -f datasets/karel_25k/id.txt ] \
   || [ "$(wc -l < datasets/karel_25k/id.txt)" -ne 35000 ]; then
  rm -rf datasets/karel_25k
  python -m demo2program_tpu.cli.generator_cli --dir_name karel_25k \
      > /tmp/karel_gen.log 2>&1
fi
[ -f datasets/karel_25k/id.txt ] || { echo "karel gen failed"; exit 1; }

# ---- stage 1: doom_main shards in the background (CPU, nice-19) ----
if ! grep -q "DOOM MAIN GEN R3C DONE" /tmp/doom_gen_r3k.log 2>/dev/null; then
  setsid nohup nice -n 19 bash scripts/doom_main_gen_r3c.sh \
      > /tmp/doom_gen_r3k.log 2>&1 < /dev/null &
  echo $! > /tmp/doom_gen.pid
fi

# ---- stage 2: Karel per-k CLR ablation (TPU) ----
bash scripts/karel_k_ablation_clr2.sh > /tmp/karel_ablation_clr.log 2>&1

# ---- stage 3: wait for the doom dataset ----
waited=0
until grep -q "DOOM MAIN GEN R3C DONE" /tmp/doom_gen_r3k.log 2>/dev/null; do
  if [ "$waited" -ge 43200 ]; then
    echo "doom gen never finished after 12h - aborting"
    exit 1
  fi
  sleep 60; waited=$((waited + 60))
done

# ---- stage 4: suite C (k=25 subset view, full + baselines + rerank) ----
bash scripts/doom_main_k25_r3j.sh > /tmp/doom_k25.log 2>&1
echo "ROUND3K CHAIN DONE"
