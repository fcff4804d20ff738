#!/bin/bash
# Round-4 Karel evidence re-materialization (VERDICT r3 next #5): the VM
# wipe destroyed every round-2/3 checkpoint and eval dump, leaving the
# RESULTS.md karel25k scoreboard unreproducible from disk. Re-train all
# four models at the round-2 protocol (30k steps, staircase LR decay) on
# the regenerated (seed-123, bit-identical) karel_25k and re-run the full
# test-split evals, incl. the beam-5 execution-rerank row. Idempotent:
# combos whose final eval log carries the completion marker are skipped.
# Small eval artifacts are harvested into results/r4/ for git.
set -x
cd /root/repo
DS=datasets/karel_25k
EV="python -m demo2program_tpu.cli.evaler_cli --dataset_path $DS --dataset_type karel --quiet --pred_program"

train_and_eval () {
  M=$1; D=$2
  if ! grep -q "Final Avg Report" $D/eval/out_*_test.log 2>/dev/null; then
    python -m demo2program_tpu.cli.trainer_cli --dataset_path $DS \
        --model $M --max_steps 30000 \
        --train_dir $D --ckpt_save_step 2000 \
        --test_sample_step 200 --log_step 50 --lr_weight_decay \
        --cell_impl pallas
    $EV --model $M --train_dir $D --output_dir $D/eval --cell_impl pallas
  else
    echo "$M already trained+evaluated; skipping"
  fi
}

train_and_eval full               train_dir/karel25k_full
train_and_eval summarizer         train_dir/karel25k_summarizer
train_and_eval synthesis_baseline train_dir/karel25k_synthesis
train_and_eval induction_baseline train_dir/karel25k_induction

# beam-5 + execution rerank on the full model (RESULTS.md 0.868 row)
if ! grep -q "Final Avg Report" \
    train_dir/karel25k_full/eval_rerank/out_*_test.log 2>/dev/null; then
  $EV --model full --train_dir train_dir/karel25k_full \
      --output_dir train_dir/karel25k_full/eval_rerank \
      --unroll_type beam --beam_width 5 --execution_rerank \
      --cell_impl pallas
fi

# harvest the small artifacts (report + log files) into git-able results/
mkdir -p results/r4/karel25k
for D in karel25k_full karel25k_summarizer karel25k_synthesis \
         karel25k_induction; do
  cp train_dir/$D/eval/out_*_test.log results/r4/karel25k/${D}.log 2>/dev/null
  cp train_dir/$D/eval/*report* results/r4/karel25k/ 2>/dev/null
done
cp train_dir/karel25k_full/eval_rerank/out_*_test.log \
   results/r4/karel25k/karel25k_full_beam5_rerank.log 2>/dev/null
cp train_dir/karel25k_full/eval_rerank/*report* results/r4/karel25k/ \
   2>/dev/null
echo "KAREL25K SUITE R4 DONE"
