#!/bin/bash
# Per-k CLR ablation EXTENSION: 100k -> 300k steps at constant LR 1e-3.
#
# Why: the 100k-step constant-LR runs (karel_k_ablation_clr_r5.sh) fix the
# r4 decay-recipe regression but their val curves are STILL CLIMBING at
# 100k (synthesis k=3: 0.377@20k -> 0.493@100k, +1.2pt/20k at the end).
# The reference's driver trains to a hardcoded 1,000,000-step ceiling
# (/root/reference/trainer.py:153), so its published per-k models saw far
# more than 100k steps. Training here is the cheap part (~1ms/step on the
# chunked HBM-cache loop); this script resumes each accepted combo dir to
# 300k, adds val evals at {150k,200k,250k,300k}, re-selects the best
# checkpoint over ALL val evals, and runs the test eval there.
#
# resume.json gotcha: an auto-resumed relaunch reads its recorded
# target_step back (train/trainer.py:429-440), so the extension must
# REWRITE resume.json with the new target before relaunching.
set -x
cd /root/repo
DS=datasets/karel_25k
TARGET=${TARGET:-300000}
NEW_VALS="150000 200000 250000 300000"
ALL_VALS="20000 40000 60000 80000 100000 150000 200000 250000 300000"
KS=${KS:-"3 5"}

pick_best_all() {
  python - "$1" <<'EOF'
import re, sys
d = sys.argv[1]
best_step, best_acc = None, -1.0
for step in (20000, 40000, 60000, 80000, 100000,
             150000, 200000, 250000, 300000):
    try:
        txt = open(f"{d}/eval_val/out_{step}_val.log").read()
    except OSError:
        continue
    ms = re.findall(
        r"test_greedy_program_execution_acc_hist: \[([^\]]*)\]", txt)
    if not ms:
        continue
    acc = float(ms[-1].split(",")[-2])
    print(f"val unseen exec @{step}: {acc:.3f}", file=sys.stderr)
    if acc > best_acc:
        best_step, best_acc = step, acc
print(best_step or 300000)
EOF
}

for K in $KS; do
  for M in synthesis_baseline summarizer; do
    # extend whichever dir the 100k suite accepted (seed-234 retry wins)
    D=train_dir/karel25k_${M}_k${K}_clr5
    SEED=123
    [ -d ${D}_s234/ckpt ] && { D=${D}_s234; SEED=234; }
    [ -d $D/ckpt ] || { echo "no 100k run for $M k=$K; skipping"; continue; }
    echo "{\"target_step\": $TARGET}" > $D/resume.json
    python -m demo2program_tpu.cli.trainer_cli --dataset_path $DS \
        --model $M --num_k $K --max_steps $TARGET \
        --seed $SEED --train_dir $D --ckpt_save_step 5000 \
        --test_sample_step 1000 --log_step 100 --cell_impl pallas
    # one process for all new val points: the jitted eval graph compiles
    # once (--sweep_steps skips already-done logs + missing ckpts itself)
    python -m demo2program_tpu.cli.evaler_cli --dataset_path $DS \
        --dataset_type karel --quiet --pred_program \
        --model $M --num_k $K --train_dir $D \
        --dataset_split val --max_steps 64 \
        --output_dir $D/eval_val --cell_impl pallas \
        --sweep_steps "$(echo $NEW_VALS | tr ' ' ',')"
    BEST=$(pick_best_all "$D")
    if ! grep -q "Final Avg Report" $D/eval/out_${BEST}_test.log \
        2>/dev/null; then
      python -m demo2program_tpu.cli.evaler_cli --dataset_path $DS \
          --dataset_type karel --quiet --pred_program \
          --model $M --num_k $K --checkpoint $D/ckpt/$BEST/default \
          --output_dir $D/eval --cell_impl pallas
    fi
    # harvest immediately (the round may end mid-suite)
    mkdir -p results/r5/karel_k_ablation_clr
    cp $D/eval/out_${BEST}_test.log \
       results/r5/karel_k_ablation_clr/$(basename $D)_ext_test_${BEST}.log \
       2>/dev/null
    for v in $D/eval_val/out_*_val.log; do
      [ -e "$v" ] && cp "$v" \
        results/r5/karel_k_ablation_clr/$(basename $D)_$(basename "$v")
    done
    echo "EXT COMBO DONE $M k=$K best=$BEST"
  done
done
echo "K ABLATION EXT300 DONE"
