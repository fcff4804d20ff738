#!/bin/bash
# Karel per-k ablation, CONSTANT-LR edition (round-3j).
#
# Why: the decayed-LR per-k retrains failed two different ways — the
# summarizer underfit (train seq acc 0.09-0.31 at 30k; the staircase decay
# froze it mid-learning) and synthesis k=3 memorized (train seq 0.9+, test
# 0.12, test loss RISING 30k->80k). The reference's published per-k table
# was produced at its DEFAULT lr_weight_decay=False — constant Adam 1e-3
# (/root/reference/trainer.py:275, README reproduce commands pass no decay
# flag) — where the higher late-stage LR both keeps the summarizer learning
# and implicitly regularizes against memorization.
#
# Protocol: train 60k steps at constant 1e-3, checkpoint every 5k; pick
# the checkpoint among {20k,40k,60k} by VAL-split unseen execution
# accuracy (2048 programs); report the TEST split at the chosen
# checkpoint. No test-split information is used for selection.
set -x
cd /root/repo
DS=datasets/karel_25k

for K in 3 5; do
  for M in synthesis_baseline summarizer; do
    D=train_dir/karel25k_${M}_k${K}_clr
    python -m demo2program_tpu.cli.trainer_cli --dataset_path $DS \
        --model $M --num_k $K --max_steps 60000 \
        --train_dir $D --ckpt_save_step 5000 \
        --test_sample_step 1000 --log_step 100 \
        --cell_impl pallas
    for STEP in 20000 40000 60000; do
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
    m = re.search(
        r"test_greedy_program_execution_acc_hist: \[([^\]]*)\]", txt)
    if not m:
        continue
    acc = float(m.group(1).split(",")[-2])  # last bucket = all-correct
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
# release the suite-C gate (round3_chain_r3j2.sh greps the old ext log)
echo "K ABLATION EXT DONE" >> /tmp/karel_ext.log
