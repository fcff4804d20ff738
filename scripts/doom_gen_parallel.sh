#!/bin/bash
# Parallel seed-shard dataset generation (VERDICT r4 next #4): DoomLite
# stepping is pure numpy and embarrassingly parallel across programs, and
# the reference itself regenerates by seed-sharding + merging
# (/root/reference/vizdoom_env/generate_dataset.sh:5-27). This driver runs
# the shards CONCURRENTLY, bounded by the host's core count, instead of
# the serial loop in doom_main_gen_r3c.sh that made each wipe cost ~12 h.
#
# NOTE measured reality on the round-5 host: nproc=1, so concurrency
# degrades to the sequential schedule there (a single DoomLite generator
# already saturates the core at ~100% CPU — parallelism cannot help a
# 1-core box). On any multi-core host this same script cuts a full
# doom_main regen to ~(12 h / min(cores, 4)) — the VERDICT target of
# <=2 h needs >=6 cores for the 4x8.5 GB shard set plus merge.
#
# Usage: doom_gen_parallel.sh [max_workers]
# Idempotent: complete shards (id.txt with the expected line count) are
# skipped; a crashed shard is wiped and regenerated.
set -e
cd /root/repo
SEEDS=(123 234 345 456)
EXPECT_LINES=2600
WORKERS=${1:-$(nproc)}
[ "$WORKERS" -ge 1 ] || WORKERS=1
echo "doom_gen_parallel: $WORKERS worker(s) over ${#SEEDS[@]} shards"

gen_shard() {
  local SEED=$1
  local DIR=datasets/doom_main_shard_len8_seed$SEED
  if [ -f "$DIR/id.txt" ] \
      && [ "$(wc -l < "$DIR/id.txt")" -eq "$EXPECT_LINES" ]; then
    echo "shard seed=$SEED already complete, skipping"
    return 0
  fi
  rm -rf "$DIR"
  nice -n 19 python -m demo2program_tpu.cli.vizdoom_generator_cli \
    --num_train 2500 --num_test 75 --num_val 25 \
    --num_demo_per_program 25 --num_test_demo_per_program 5 \
    --max_demo_length 8 --max_program_length 32 --perception_type simple \
    --dir_name doom_main_shard --seed "$SEED" \
    > "/tmp/doom_shard_seed${SEED}.log" 2>&1
  [ -f "$DIR/id.txt" ] \
    && [ "$(wc -l < "$DIR/id.txt")" -eq "$EXPECT_LINES" ] \
    || { echo "shard seed=$SEED FAILED (see /tmp/doom_shard_seed${SEED}.log)"
         return 1; }
  echo "shard seed=$SEED done"
}

# bounded-concurrency scheduler: at most $WORKERS shard processes at once
pids=()
fail=0
for SEED in "${SEEDS[@]}"; do
  while [ "$(jobs -rp | wc -l)" -ge "$WORKERS" ]; do
    sleep 10
  done
  gen_shard "$SEED" &
  pids+=($!)
done
for pid in "${pids[@]}"; do
  wait "$pid" || fail=1
done
[ "$fail" -eq 0 ] || { echo "doom_gen_parallel: a shard failed"; exit 1; }

python -m demo2program_tpu.data.merge_datasets \
  datasets/doom_main_shard_len8_seed123 \
  datasets/doom_main_shard_len8_seed234 \
  datasets/doom_main_shard_len8_seed345 \
  datasets/doom_main_shard_len8_seed456 \
  --out_dir datasets/doom_main
wc -l datasets/doom_main/id.txt
echo "DOOM GEN PARALLEL DONE"
