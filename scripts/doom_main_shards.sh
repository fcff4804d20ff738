#!/bin/bash
# Main (non-ifelse) ViZDoom dataset via the reference's seed-sharding +
# merge flow (/root/reference/vizdoom_env/generate_dataset.sh) at reduced
# scale: two len-8 shards merged into datasets/doom_main.
set -x
cd /root/repo
GEN="python -m demo2program_tpu.cli.vizdoom_generator_cli \
  --num_train 1500 --num_test 150 --num_val 50 \
  --num_demo_per_program 25 --num_test_demo_per_program 5 \
  --max_demo_length 8 --max_program_length 32 --perception_type simple"
$GEN --dir_name doom_main_shard --seed 123
$GEN --dir_name doom_main_shard --seed 234
python -c "
from demo2program_tpu.data.merge_datasets import merge
merge(['datasets/doom_main_shard_len8_seed123',
       'datasets/doom_main_shard_len8_seed234'],
      'datasets/doom_main')
"
echo "DOOM MAIN SHARDS DONE"
