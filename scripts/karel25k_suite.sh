#!/bin/bash
# Reference-scale Karel runs: train + eval the remaining three models on
# datasets/karel_25k, then eval the already-trained full model.
# (The full model's 30k-step run is launched separately; this script chains
# everything that follows so the single TPU stays busy.)
set -x
cd /root/repo
DS=datasets/karel_25k
EV="python -m demo2program_tpu.cli.evaler_cli --dataset_path $DS --dataset_type karel --quiet --pred_program"

# full model eval (test split)
$EV --model full --train_dir train_dir/karel25k_full \
    --output_dir train_dir/karel25k_full/eval \
    --cell_impl pallas

python -m demo2program_tpu.cli.trainer_cli --dataset_path $DS \
    --model summarizer --max_steps 30000 \
    --train_dir train_dir/karel25k_summarizer --ckpt_save_step 2000 \
    --test_sample_step 200 --log_step 50 --lr_weight_decay \
    --cell_impl pallas
$EV --model summarizer --train_dir train_dir/karel25k_summarizer \
    --output_dir train_dir/karel25k_summarizer/eval --cell_impl pallas

python -m demo2program_tpu.cli.trainer_cli --dataset_path $DS \
    --model synthesis_baseline --max_steps 30000 \
    --train_dir train_dir/karel25k_synthesis --ckpt_save_step 2000 \
    --test_sample_step 200 --log_step 50 --lr_weight_decay \
    --cell_impl pallas
$EV --model synthesis_baseline --train_dir train_dir/karel25k_synthesis \
    --output_dir train_dir/karel25k_synthesis/eval --cell_impl pallas

python -m demo2program_tpu.cli.trainer_cli --dataset_path $DS \
    --model induction_baseline --max_steps 30000 \
    --train_dir train_dir/karel25k_induction --ckpt_save_step 2000 \
    --test_sample_step 200 --log_step 50 --lr_weight_decay \
    --cell_impl pallas
$EV --model induction_baseline --train_dir train_dir/karel25k_induction \
    --output_dir train_dir/karel25k_induction/eval --cell_impl pallas

echo "SUITE DONE"
