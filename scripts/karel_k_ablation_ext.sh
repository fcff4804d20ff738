#!/bin/bash
# Karel per-k ablation EXTENSION (round-3j): the 30k-step per-k retrains
# (scripts/karel_k_ablation.sh) were still fast-improving at their final
# step (test loss e.g. summarizer_k5 0.69->0.54 over the last 2k steps) —
# small k means fewer supervised tokens per batch, so convergence needs
# more steps than the k=10 headline runs. The reference's driver runs to
# max_steps=1,000,000 with the SAME staircase LR decay
# (/root/reference/trainer.py:84-90,153), so continuing 30k->80k under
# the existing schedule is exactly equivalent to a longer reference run.
# Continuation uses the trainer's auto-resume: bump resume.json's
# target_step, relaunch the identical command.
set -x
cd /root/repo
DS=datasets/karel_25k
TARGET=80000
EV="python -m demo2program_tpu.cli.evaler_cli --dataset_path $DS --dataset_type karel --quiet --pred_program"

for K in 3 5; do
  for M in synthesis_baseline summarizer; do
    D=train_dir/karel25k_${M}_k${K}
    python - "$D" "$TARGET" <<'EOF'
import json, sys
path = sys.argv[1] + "/resume.json"
json.dump({"target_step": int(sys.argv[2])}, open(path, "w"))
print("resume target ->", sys.argv[2], "in", path)
EOF
    python -m demo2program_tpu.cli.trainer_cli --dataset_path $DS \
        --model $M --num_k $K --max_steps $TARGET \
        --train_dir $D --ckpt_save_step 5000 \
        --test_sample_step 1000 --log_step 100 --lr_weight_decay \
        --cell_impl pallas
    $EV --model $M --num_k $K --train_dir $D \
        --output_dir $D/eval --cell_impl pallas
  done
done
echo "K ABLATION EXT DONE"
