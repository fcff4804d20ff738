#!/bin/bash
# Karel k-ablation (reference README.md:153-158): synthesis baseline and
# summarizer trained AND evaluated at k=3 and k=5 seen demos (the k=10
# column is the main karel25k table). Default num_k=10; --num_k slices the
# stored 10 demos at load (data/dataset.py). Auto-resume-safe.
set -x
cd /root/repo
DS=datasets/karel_25k
EV="python -m demo2program_tpu.cli.evaler_cli --dataset_path $DS --dataset_type karel --quiet --pred_program"

for K in 3 5; do
  for M in synthesis_baseline summarizer; do
    python -m demo2program_tpu.cli.trainer_cli --dataset_path $DS \
        --model $M --num_k $K --max_steps 30000 \
        --train_dir train_dir/karel25k_${M}_k${K} --ckpt_save_step 5000 \
        --test_sample_step 1000 --log_step 100 --lr_weight_decay \
        --cell_impl pallas
    $EV --model $M --num_k $K --train_dir train_dir/karel25k_${M}_k${K} \
        --output_dir train_dir/karel25k_${M}_k${K}/eval --cell_impl pallas
  done
done
echo "K ABLATION DONE"
