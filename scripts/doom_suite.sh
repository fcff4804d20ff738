#!/bin/bash
# ViZDoom if-else runs on the DoomLite-generated dataset at the reference's
# FULL two-stage budget: stage 1 bs=32 50k iters, stage 2 warm-started bs=8
# 50k iters (/root/reference/README.md:116-133), then an eval report on the
# test split. Safe to relaunch after a crash: the trainer auto-resumes from
# the latest checkpoint in each train_dir (train/trainer.py).
set -x
cd /root/repo
DS=datasets/doom_ifelse_len2_seed123
COMMON="--dataset_type vizdoom --dataset_path $DS --num_k 25 --cell_impl pallas"
EV="python -m demo2program_tpu.cli.evaler_cli $COMMON --quiet --pred_program"

python -m demo2program_tpu.cli.trainer_cli $COMMON --model full \
    --batch_size 32 --max_steps 50000 --lr_weight_decay \
    --train_dir train_dir/doom_ifelse_full_s1 --ckpt_save_step 5000 \
    --test_sample_step 1000 --log_step 100
python -m demo2program_tpu.cli.trainer_cli $COMMON --model full \
    --batch_size 8 --max_steps 50000 --lr_weight_decay \
    --checkpoint train_dir/doom_ifelse_full_s1/ckpt/50000/default \
    --train_dir train_dir/doom_ifelse_full_s2 --ckpt_save_step 5000 \
    --test_sample_step 1000 --log_step 100
$EV --model full --train_dir train_dir/doom_ifelse_full_s2 \
    --output_dir train_dir/doom_ifelse_full_s2/eval

python -m demo2program_tpu.cli.trainer_cli $COMMON \
    --model synthesis_baseline --batch_size 32 --max_steps 50000 \
    --lr_weight_decay --train_dir train_dir/doom_ifelse_synthesis_s1 \
    --ckpt_save_step 5000 --test_sample_step 1000 --log_step 100
python -m demo2program_tpu.cli.trainer_cli $COMMON \
    --model synthesis_baseline --batch_size 8 --max_steps 50000 \
    --lr_weight_decay \
    --checkpoint train_dir/doom_ifelse_synthesis_s1/ckpt/50000/default \
    --train_dir train_dir/doom_ifelse_synthesis_s2 --ckpt_save_step 5000 \
    --test_sample_step 1000 --log_step 100
$EV --model synthesis_baseline \
    --train_dir train_dir/doom_ifelse_synthesis_s2 \
    --output_dir train_dir/doom_ifelse_synthesis_s2/eval

python -m demo2program_tpu.cli.trainer_cli $COMMON \
    --model induction_baseline --batch_size 32 --max_steps 50000 \
    --lr_weight_decay --train_dir train_dir/doom_ifelse_induction \
    --ckpt_save_step 5000 --test_sample_step 1000 --log_step 100
$EV --model induction_baseline --train_dir train_dir/doom_ifelse_induction \
    --output_dir train_dir/doom_ifelse_induction/eval

echo "DOOM SUITE DONE"
