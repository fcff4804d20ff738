#!/bin/bash
# Karel per-k ablation, CONSTANT-LR edition — idempotent rerun wrapper
# (round-3k, post-wipe). Same protocol as karel_k_ablation_clr.sh (see its
# header for the decayed-LR failure analysis): train 60k steps at constant
# Adam 1e-3 (the reference default, /root/reference/trainer.py:275), pick
# the checkpoint among {20k,40k,60k} by VAL-split unseen execution
# accuracy, report the TEST split at the chosen checkpoint.
# Idempotence: a (model, k) combo whose final test eval log exists is
# skipped entirely; a half-trained combo auto-resumes from its latest ckpt.
set -x
cd /root/repo
DS=datasets/karel_25k

for K in 3 5; do
  for M in synthesis_baseline summarizer; do
    D=train_dir/karel25k_${M}_k${K}_clr
    if ls $D/eval/out_*_test.log > /dev/null 2>&1; then
      echo "combo $M k=$K already evaluated; skipping"
      continue
    fi
    python -m demo2program_tpu.cli.trainer_cli --dataset_path $DS \
        --model $M --num_k $K --max_steps 60000 \
        --train_dir $D --ckpt_save_step 5000 \
        --test_sample_step 1000 --log_step 100 \
        --cell_impl pallas
    for STEP in 20000 40000 60000; do
      # gate on the completion marker, not mere log existence: a crashed
      # eval leaves a partial log that must be redone (ADVICE r3 low)
      if grep -q "Final Avg Report" $D/eval_val/out_${STEP}_val.log \
          2>/dev/null; then
        continue
      fi
      python -m demo2program_tpu.cli.evaler_cli --dataset_path $DS \
          --dataset_type karel --quiet --pred_program \
          --model $M --num_k $K --checkpoint $D/ckpt/$STEP/default \
          --dataset_split val --max_steps 64 \
          --output_dir $D/eval_val --cell_impl pallas
    done
    BEST=$(python - "$D" <<'EOF'
import re, sys
d = sys.argv[1]
best_step, best_acc = None, -1.0
for step in (20000, 40000, 60000):
    try:
        txt = open(f"{d}/eval_val/out_{step}_val.log").read()
    except OSError:
        continue
    # the LAST match is the [Final Avg Report] over all eval batches; the
    # first is the noisy single-batch step-0 line (ADVICE r3 high)
    ms = re.findall(
        r"test_greedy_program_execution_acc_hist: \[([^\]]*)\]", txt)
    if not ms:
        continue
    acc = float(ms[-1].split(",")[-2])  # last bucket = all-correct
    print(f"val unseen exec @{step}: {acc:.3f}", file=sys.stderr)
    if acc > best_acc:
        best_step, best_acc = step, acc
print(best_step or 60000)
EOF
)
    python -m demo2program_tpu.cli.evaler_cli --dataset_path $DS \
        --dataset_type karel --quiet --pred_program \
        --model $M --num_k $K --checkpoint $D/ckpt/$BEST/default \
        --output_dir $D/eval --cell_impl pallas
  done
done
echo "K ABLATION CLR DONE"
