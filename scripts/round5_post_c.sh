#!/bin/bash
# Round-5 stretch queue: runs after scripts/round5_chain_c.sh finishes.
#   I  - doom if-else v3-silhouette retrain (VERDICT r4 next #3), at
#        TIME-BOXED budgets (10k bs32 + 8k bs8 vs the reference 50k+50k:
#        the ifelse3 train split is 10k programs = 312 steps/epoch, so
#        10k steps is ~32 epochs; the v2 control from r3 showed doom
#        ifelse converging well inside 20k steps). Greedy + beam-5 rerank
#        eval, error analysis for the species-confusion share (the v3
#        sprites' target), harvest to results/r5/doom_ifelse_v3/.
# Marker: /tmp/r5_stage_I.done. Launch detached:
#   setsid nohup bash scripts/round5_post_c.sh \
#       > /tmp/r5_post_c.log 2>&1 < /dev/null &
set -x
if ! mkdir /tmp/r5_postc.lock 2>/dev/null; then
  pid=$(cat /tmp/r5_postc.lock/pid 2>/dev/null)
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null \
      && grep -q round5_post_c "/proc/$pid/cmdline" 2>/dev/null; then
    echo "another round5 post-C queue is live (pid $pid)"; exit 1
  fi
fi
mkdir -p /tmp/r5_postc.lock
echo $$ > /tmp/r5_postc.lock/pid
cd /root/repo

until grep -q "ROUND5 CHAIN C DONE" /tmp/r5_chainc.log 2>/dev/null; do
  sleep 60
done

DS=datasets/doom_ifelse3_len2_seed123
ISTEPS1=${ISTEPS1:-10000}
ISTEPS2=${ISTEPS2:-8000}
if [ -f $DS/id.txt ] && [ "$(wc -l < $DS/id.txt)" -eq 11100 ] \
   && [ ! -f /tmp/r5_stage_I.done ]; then
  python scripts/doom_stage_runner.py \
      --dataset_path $DS --num_k 25 \
      --stage model=full,bs=32,steps=$ISTEPS1,dir=train_dir/ifelse3_full_s1,eval=0 \
      --stage model=full,bs=8,steps=$ISTEPS2,dir=train_dir/ifelse3_full_s2,warm=train_dir/ifelse3_full_s1/ckpt/$ISTEPS1/default \
      > /tmp/ifelse3_train.log 2>&1
  f=$(ls -t train_dir/ifelse3_full_s2/eval/out_*_test.log 2>/dev/null | head -1)
  if [ -n "$f" ] && grep -q "Final Avg Report" "$f"; then
    mkdir -p results/r5/doom_ifelse_v3
    cp "$f" results/r5/doom_ifelse_v3/full_greedy.log
    JAX_PLATFORMS=cpu python -m demo2program_tpu.tools.doom_error_analysis \
        --dump "$(ls -t train_dir/ifelse3_full_s2/eval/out_*_test.txt \
                  2>/dev/null | head -1)" \
        > results/r5/doom_ifelse_v3/error_analysis.log 2>&1 || true
    timeout 5400 python -m demo2program_tpu.cli.evaler_cli \
        --dataset_type vizdoom --dataset_path $DS --num_k 25 \
        --cell_impl pallas --model full \
        --train_dir train_dir/ifelse3_full_s2 \
        --output_dir train_dir/ifelse3_full_s2/eval_rerank \
        --pred_program --quiet --unroll_type beam --beam_width 5 \
        --execution_rerank > /tmp/ifelse3_rerank.log 2>&1
    fr=$(ls -t train_dir/ifelse3_full_s2/eval_rerank/out_*_test.log \
           2>/dev/null | head -1)
    [ -n "$fr" ] && grep -q "Final Avg Report" "$fr" \
      && cp "$fr" results/r5/doom_ifelse_v3/full_beam5_rerank.log
    touch /tmp/r5_stage_I.done
  else
    echo "stage I FAILED (no completed test eval)"
  fi
fi
echo "ROUND5 POST C DONE"
