#!/bin/bash
# Round-3b doom_main suite at the REFERENCE iteration budget.
#
# The HBM probe (2.1 ms/step at bs=32 k=15 doom shapes) showed training
# compute is minutes, not hours — the binding constraints are the HBM
# device-cache size (n * k * T * frame bytes <= ~12 GB on the 16 GB chip)
# and the one-time sidecar build + push. So unlike the round-3a reduced run
# (25k+15k at k=15 on 3k programs), this suite trains the full model with
# the reference's 50k+50k two-stage recipe (/root/reference/README.md:116-133)
# on the 10k-program merged dataset at k=8 (cache 12.3 GB), plus 25k-step
# baselines, all through the one-push stage runner. Ends with the
# beam-5 + execution-rerank eval (the framework's inference-time search).
set -x
cd /root/repo
DS=datasets/doom_main
K=8
python scripts/doom_stage_runner.py \
    --dataset_path $DS --num_k $K \
    --stage model=full,bs=32,steps=50000,dir=train_dir/doom_main_full_s1,eval=0 \
    --stage model=full,bs=8,steps=50000,dir=train_dir/doom_main_full_s2,warm=train_dir/doom_main_full_s1/ckpt/50000/default \
    --stage model=synthesis_baseline,bs=32,steps=25000,dir=train_dir/doom_main_synthesis \
    --stage model=induction_baseline,bs=32,steps=25000,dir=train_dir/doom_main_induction

python -m demo2program_tpu.cli.evaler_cli \
    --dataset_type vizdoom --dataset_path $DS --num_k $K \
    --cell_impl pallas --model full --train_dir train_dir/doom_main_full_s2 \
    --output_dir train_dir/doom_main_full_s2/eval_rerank \
    --pred_program --quiet --unroll_type beam --beam_width 5 \
    --execution_rerank --rerank_k 25
echo "DOOM MAIN R3B SUITE DONE"
