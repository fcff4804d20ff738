#!/bin/bash
# Suite C, round-5 edition: doom_main at k=25 on the DIRECTLY generated
# 2500/300/100 dataset (datasets/doom_main25_len8_seed123 — see
# scripts/round5_gen_b.sh for why the r4 full-10.4k regen was dropped on
# the 1-core host). Same training regime as scripts/doom_main_k25_r3j.sh:
# the reference's exact seen-demo count k=25
# (/root/reference/README.md:100-133) at the reference two-stage budget
# (50k bs32 + 50k bs8, README.md:116-133) for the full model, plus the
# synthesis/induction baselines at the suite-A 25k budget, all through one
# stage-runner process (one HBM cache push), then beam-10 +
# execution-rerank eval of the full model.
# Idempotent: completed stages are skipped, crashed stages auto-resume.
#
# r5 protocol fix: stages now train at CONSTANT Adam 1e-3 (the runner's
# new default) — the reference's doom commands never pass
# --lr_weight_decay (/root/reference/README.md:116-133, trainer.py:275),
# and under the old hardcoded decay flag the warm-started stage 2 resumed
# the staircase at ~3e-5 -> 1e-6, i.e. an effectively frozen finetune.
set -x
cd /root/repo
STEPS1=${STEPS1:-50000}
STEPS2=${STEPS2:-50000}
BSTEPS=${BSTEPS:-25000}
DS=datasets/doom_main25_len8_seed123
[ -f $DS/id.txt ] && [ "$(wc -l < $DS/id.txt)" -eq 2900 ] \
  || { echo "doom_main25 dataset missing/incomplete"; exit 1; }

python scripts/doom_stage_runner.py \
    --dataset_path $DS --num_k 25 \
    --stage model=full,bs=32,steps=$STEPS1,dir=train_dir/doom_main2k5_full_s1,eval=0 \
    --stage model=full,bs=8,steps=$STEPS2,dir=train_dir/doom_main2k5_full_s2,warm=train_dir/doom_main2k5_full_s1/ckpt/$STEPS1/default \
    --stage model=synthesis_baseline,bs=32,steps=$BSTEPS,dir=train_dir/doom_main2k5_synthesis \
    --stage model=induction_baseline,bs=32,steps=$BSTEPS,dir=train_dir/doom_main2k5_induction

# beam-10 + execution rerank (suite A k=8 showed rerank bounded by
# right-program-in-beam; the k=25 model gets the wider search)
python -m demo2program_tpu.cli.evaler_cli \
    --dataset_type vizdoom --dataset_path $DS --num_k 25 \
    --cell_impl pallas --model full --train_dir train_dir/doom_main2k5_full_s2 \
    --output_dir train_dir/doom_main2k5_full_s2/eval_rerank \
    --pred_program --quiet --unroll_type beam --beam_width 10 \
    --execution_rerank
echo "DOOM MAIN K25 R5 SUITE DONE"
