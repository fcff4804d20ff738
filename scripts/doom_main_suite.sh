#!/bin/bash
# Main (non-ifelse) ViZDoom runs on the merged shard dataset. k=15 keeps the
# HBM-resident train cache inside the device budget on a single v5e chip
# (the reference trains at k=25 on a 505 GB dataset; this is a reduced-scale
# capability demonstration, documented in RESULTS.md).
set -x
cd /root/repo
DS=datasets/doom_main
COMMON="--dataset_type vizdoom --dataset_path $DS --num_k 15 --cell_impl pallas"
EV="python -m demo2program_tpu.cli.evaler_cli $COMMON --quiet --pred_program"

python -m demo2program_tpu.cli.trainer_cli $COMMON --model full \
    --batch_size 32 --max_steps 15000 --lr_weight_decay \
    --train_dir train_dir/doom_main_full_s1 --ckpt_save_step 2500 \
    --test_sample_step 500 --log_step 100
python -m demo2program_tpu.cli.trainer_cli $COMMON --model full \
    --batch_size 8 --max_steps 10000 --lr_weight_decay \
    --checkpoint train_dir/doom_main_full_s1/ckpt/15000/default \
    --train_dir train_dir/doom_main_full_s2 --ckpt_save_step 2500 \
    --test_sample_step 500 --log_step 100
$EV --model full --train_dir train_dir/doom_main_full_s2 \
    --output_dir train_dir/doom_main_full_s2/eval

python -m demo2program_tpu.cli.trainer_cli $COMMON \
    --model synthesis_baseline --batch_size 32 --max_steps 15000 \
    --lr_weight_decay --train_dir train_dir/doom_main_synthesis \
    --ckpt_save_step 2500 --test_sample_step 500 --log_step 100
$EV --model synthesis_baseline --train_dir train_dir/doom_main_synthesis \
    --output_dir train_dir/doom_main_synthesis/eval

echo "DOOM MAIN SUITE DONE"
