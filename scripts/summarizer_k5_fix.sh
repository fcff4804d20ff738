#!/bin/bash
# Rescue the summarizer k=5 per-k row. Seed 123 at constant LR crossed
# the takeoff threshold only at ~250k steps (val exec 0.046 @200k ->
# 0.326 @250k -> 0.191 @300k — mid-takeoff, noisy, nowhere near
# converged; the suite's 0.30 threshold judged it "taken off" by 2.6 pt
# so the automated seed retry never fired). Published row: 0.631.
# Two cheap shots (~45 min total with sweep-mode evals):
#   1. extend seed 123 from 300k to 500k — its takeoff has begun, the
#      k=3 runs gained ~+10 pt/100k while climbing
#   2. a fresh seed-234 run to 300k — k=3/k=5 takeoff onset is seed-
#      dependent; an earlier takeoff converges inside 300k
# Best checkpoint is picked on VAL across BOTH dirs, test split reported
# there, evidence harvested to results/r5/karel_k_ablation_clr/.
# Runs inside the chain's karel slot (no TPU pause machinery needed).
set -x
cd /root/repo
DS=datasets/karel_25k
D1=train_dir/karel25k_summarizer_k5_clr5
D2=train_dir/karel25k_summarizer_k5_clr5_s234b

# ---- 1: extend seed 123 to 500k (resume.json rewrite, ext300 pattern) ----
if [ -d $D1/ckpt/300000 ] && [ ! -d $D1/ckpt/500000 ]; then
  echo '{"target_step": 500000}' > $D1/resume.json
  python scripts/watchdog_run.py --stale 1500 --retries 3 \
      --watch "$D1/metrics.jsonl" --watch "$D1/samples.txt" -- \
    python -m demo2program_tpu.cli.trainer_cli --dataset_path $DS \
      --model summarizer --num_k 5 --max_steps 500000 --seed 123 \
      --train_dir $D1 --ckpt_save_step 5000 --test_sample_step 1000 \
      --log_step 100 --cell_impl pallas
fi
python -m demo2program_tpu.cli.evaler_cli --dataset_path $DS \
    --dataset_type karel --quiet --pred_program \
    --model summarizer --num_k 5 --train_dir $D1 \
    --dataset_split val --max_steps 64 --output_dir $D1/eval_val \
    --cell_impl pallas --sweep_steps "350000,400000,450000,500000"

# ---- 2: fresh seed 234 to 300k ----
if [ ! -d $D2/ckpt/300000 ]; then
  python scripts/watchdog_run.py --stale 1500 --retries 3 \
      --watch "$D2/metrics.jsonl" --watch "$D2/samples.txt" -- \
    python -m demo2program_tpu.cli.trainer_cli --dataset_path $DS \
      --model summarizer --num_k 5 --max_steps 300000 --seed 234 \
      --train_dir $D2 --ckpt_save_step 5000 --test_sample_step 1000 \
      --log_step 100 --cell_impl pallas
fi
python -m demo2program_tpu.cli.evaler_cli --dataset_path $DS \
    --dataset_type karel --quiet --pred_program \
    --model summarizer --num_k 5 --train_dir $D2 \
    --dataset_split val --max_steps 64 --output_dir $D2/eval_val \
    --cell_impl pallas \
    --sweep_steps "50000,100000,150000,200000,250000,300000"

# ---- pick the best (dir, step) on val across both runs ----
read -r BD BEST <<< "$(python - "$D1" "$D2" <<'EOF'
import re
import sys
best = (None, None, -1.0)
for d in sys.argv[1:]:
    for step in (20000, 40000, 50000, 60000, 80000, 100000, 150000,
                 200000, 250000, 300000, 350000, 400000, 450000, 500000):
        try:
            txt = open(f"{d}/eval_val/out_{step}_val.log").read()
        except OSError:
            continue
        ms = re.findall(
            r"test_greedy_program_execution_acc_hist: \[([^\]]*)\]", txt)
        if not ms:
            continue
        acc = float(ms[-1].split(",")[-2])
        print(f"{d} val unseen exec @{step}: {acc:.3f}", file=sys.stderr)
        if acc > best[2]:
            best = (d, step, acc)
print(best[0], best[1])
EOF
)"
[ -n "$BD" ] && [ "$BD" != "None" ] || { echo "no val evals found"; exit 1; }
if ! grep -q "Final Avg Report" $BD/eval/out_${BEST}_test.log 2>/dev/null; then
  python -m demo2program_tpu.cli.evaler_cli --dataset_path $DS \
      --dataset_type karel --quiet --pred_program \
      --model summarizer --num_k 5 --checkpoint $BD/ckpt/$BEST/default \
      --output_dir $BD/eval --cell_impl pallas
fi
mkdir -p results/r5/karel_k_ablation_clr
cp $BD/eval/out_${BEST}_test.log \
   results/r5/karel_k_ablation_clr/summarizer_k5_fix_test_$(basename $BD)_${BEST}.log
for v in $D1/eval_val/out_*_val.log $D2/eval_val/out_*_val.log; do
  [ -e "$v" ] && cp "$v" \
    results/r5/karel_k_ablation_clr/$(basename $(dirname $(dirname "$v")))_$(basename "$v")
done
echo "SUMMARIZER K5 FIX DONE best=$BD@$BEST"
