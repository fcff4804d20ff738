#!/bin/bash
# Suite C, round-5 TIME-BOXED edition. Same protocol as
# scripts/doom_main_k25_r5.sh (constant Adam 1e-3, two-stage full model
# per /root/reference/README.md:116-133, k=25 seen demos) but with the
# budgets cut to fit the remaining round-5 wall clock and the stages
# reordered so every completed stage lands a committed number:
#
#   phase F (headline first): full s1 bs=32 @15k steps -> TEST EVAL ->
#            full s2 bs=8 warm-started, +10k steps (15k->25k) -> TEST
#            EVAL -> beam-10 + execution-rerank eval
#   phase B: synthesis bs=32 @10k -> EVAL -> induction bs=32 @10k -> EVAL
#
# Why the cut is sound: this round trains on a 2500-program view
# (scripts/round5_gen_b.sh) = 78 steps/epoch at bs=32, so 15k steps is
# already ~190 epochs (the reference's 50k on its full ~8k-program train
# split is ~200 epochs — comparable optimization per example). The
# original 50k+50k+25k+25k at the measured 0.43 s/step (bs=32) is ~14 h
# of chip — unfinishable this round, and an unfinished suite harvests
# NOTHING for the third round in a row. Budgets stay env-overridable;
# the extension path is idempotent relaunch with bigger STEPS* (resume
# from latest ckpt, eval logs gate re-eval).
#
# Harvest is inline after each eval so a mid-suite round end still
# leaves results/r5/doom_main_k25/ populated.
# PHASE=F runs only the full-model phase, PHASE=B only the baselines —
# the round-5 chain interleaves the cheap karel k=10 suite between them.
set -x
cd /root/repo
PHASE=${PHASE:-all}
STEPS1=${STEPS1:-15000}
STEPS2=${STEPS2:-10000}
SSTEPS=${SSTEPS:-10000}
ISTEPS=${ISTEPS:-10000}
DS=datasets/doom_main25_len8_seed123
RD=results/r5/doom_main_k25
mkdir -p $RD
[ -f $DS/id.txt ] && [ "$(wc -l < $DS/id.txt)" -eq 2900 ] \
  || { echo "doom_main25 dataset missing/incomplete"; exit 1; }

harvest() {  # $1 = train_dir basename, $2 = eval subdir (default eval)
  local SUB=${2:-eval} f r
  f=$(ls -t train_dir/$1/$SUB/out_*_test.log 2>/dev/null | head -1)
  if [ -n "$f" ] && grep -q "Final Avg Report" "$f"; then
    cp "$f" $RD/$1${2:+_$2}.log
    for r in train_dir/$1/$SUB/*report*; do [ -e "$r" ] && cp "$r" $RD/; done
  fi
}

# ---- phase F: full model (one HBM cache push for both stages) ----
# watchdog: the tunnel intermittently wedges a client forever (zero CPU,
# hung device RPC). 2100 s stale > the worst legitimate silent window
# (HBM cache push + first train-step compile); stages resume exactly on
# relaunch, evals skip completed logs (which now flush per batch).
WD="python scripts/watchdog_run.py --stale 2100 --retries 3
    --watch train_dir/doom_main2k5_*/metrics.jsonl
    --watch train_dir/doom_main2k5_*/eval*/out_*
    --watch train_dir/doom_main2k5_*/samples.txt --"
if [ "$PHASE" != "B" ]; then
$WD python scripts/doom_stage_runner.py \
    --dataset_path $DS --num_k 25 \
    --stage model=full,bs=32,steps=$STEPS1,dir=train_dir/doom_main2k5_full_s1 \
    --stage model=full,bs=8,steps=$STEPS2,dir=train_dir/doom_main2k5_full_s2,warm=train_dir/doom_main2k5_full_s1/ckpt/$STEPS1/default
harvest doom_main2k5_full_s1
harvest doom_main2k5_full_s2

# beam-10 + execution rerank immediately after the headline model (suite-A
# k=8 showed rerank bounded by right-program-in-beam; k=25 gets the wider
# search). Bounded so a pathological beam run can't eat the round.
if [ -d train_dir/doom_main2k5_full_s2/ckpt ] \
   && ! grep -q "Final Avg Report" \
        train_dir/doom_main2k5_full_s2/eval_rerank/out_*_test.log 2>/dev/null
then
  timeout 7200 $WD python -m demo2program_tpu.cli.evaler_cli \
      --dataset_type vizdoom --dataset_path $DS --num_k 25 \
      --cell_impl pallas --model full \
      --train_dir train_dir/doom_main2k5_full_s2 \
      --output_dir train_dir/doom_main2k5_full_s2/eval_rerank \
      --pred_program --quiet --unroll_type beam --beam_width 10 \
      --execution_rerank
fi
f=$(ls -t train_dir/doom_main2k5_full_s2/eval_rerank/out_*_test.log \
      2>/dev/null | head -1)
[ -n "$f" ] && grep -q "Final Avg Report" "$f" \
  && cp "$f" $RD/full_beam10_rerank.log
for r in train_dir/doom_main2k5_full_s2/eval_rerank/*report*; do
  [ -e "$r" ] && cp "$r" $RD/
done
JAX_PLATFORMS=cpu python -m demo2program_tpu.tools.doom_error_analysis \
    --dump "$(ls -t train_dir/doom_main2k5_full_s2/eval/out_*_test.txt \
              2>/dev/null | head -1)" \
    > $RD/error_analysis.log 2>&1 || true
echo "DOOM R5B PHASE F DONE"
fi
[ "$PHASE" = "F" ] && exit 0

# ---- phase B: baselines (second cache push, ~8 min — accepted so the
# headline full-model rows could land first) ----
$WD python scripts/doom_stage_runner.py \
    --dataset_path $DS --num_k 25 \
    --stage model=synthesis_baseline,bs=32,steps=$SSTEPS,dir=train_dir/doom_main2k5_synthesis \
    --stage model=induction_baseline,bs=32,steps=$ISTEPS,dir=train_dir/doom_main2k5_induction
harvest doom_main2k5_synthesis
harvest doom_main2k5_induction
echo "DOOM MAIN K25 R5B SUITE DONE"
