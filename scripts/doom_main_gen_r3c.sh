#!/bin/bash
# Regenerate datasets/doom_main (10,000/300/100 programs, 25+5 demos,
# len<=8) as 4 seed-shards of 2500/75/25 — the reference's seed-sharding +
# merge flow (/root/reference/vizdoom_env/generate_dataset.sh) sized for
# the round-3b suites (scripts/doom_main_r3b.sh asserts 10400 merged ids).
# Idempotent: finished shards (id.txt present with 2600 lines) are skipped,
# so the script can be relaunched after a crash.
set -ex
cd /root/repo
SEEDS="123 234 345 456"
for SEED in $SEEDS; do
  DIR=datasets/doom_main_shard_len8_seed$SEED
  if [ -f "$DIR/id.txt" ] && [ "$(wc -l < "$DIR/id.txt")" -eq 2600 ]; then
    echo "shard seed=$SEED already complete, skipping"
    continue
  fi
  rm -rf "$DIR"
  python -m demo2program_tpu.cli.vizdoom_generator_cli \
    --num_train 2500 --num_test 75 --num_val 25 \
    --num_demo_per_program 25 --num_test_demo_per_program 5 \
    --max_demo_length 8 --max_program_length 32 --perception_type simple \
    --dir_name doom_main_shard --seed "$SEED"
done
python -m demo2program_tpu.data.merge_datasets \
  datasets/doom_main_shard_len8_seed123 \
  datasets/doom_main_shard_len8_seed234 \
  datasets/doom_main_shard_len8_seed345 \
  datasets/doom_main_shard_len8_seed456 \
  --out_dir datasets/doom_main
wc -l datasets/doom_main/id.txt
echo "DOOM MAIN GEN R3C DONE"
