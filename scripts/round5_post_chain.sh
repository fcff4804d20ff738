#!/bin/bash
# Round-5 post-chain queue: work that must wait for the single-tenant
# chip until scripts/round5_chain_b.sh finishes everything (stage order
# P1 -> C -> P2(+k3 ext300) -> S -> I).
#   V  - doom_main k=25 val-selected checkpoint rows (guards the
#        2500-program x ~640-epoch constant-LR regime against picking an
#        overfit final checkpoint; headline rows stay final-ckpt)
#   K10- per-k CLR suite at k=10 (completes the constant-LR per-k table
#        3/5/10 and is a second shot at the synthesis k=10 published row
#        0.641, which the r4 decay regen missed by 0.4pt)
# Markers: /tmp/r5_stage_V.done, /tmp/r5_stage_K10.done.
# Launch detached:
#   setsid nohup bash scripts/round5_post_chain.sh \
#       > /tmp/r5_post_chain.log 2>&1 < /dev/null &
set -x
if ! mkdir /tmp/r5_post.lock 2>/dev/null; then
  pid=$(cat /tmp/r5_post.lock/pid 2>/dev/null)
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null \
      && grep -q round5_post "/proc/$pid/cmdline" 2>/dev/null; then
    echo "another round5 post-chain queue is live (pid $pid)"; exit 1
  fi
fi
mkdir -p /tmp/r5_post.lock
echo $$ > /tmp/r5_post.lock/pid
cd /root/repo

until grep -q "ROUND5 CHAIN B DONE" /tmp/r5_chain.log 2>/dev/null; do
  sleep 60
done

# ---- stage V: doom k25 val-selected rows ----
if [ ! -f /tmp/r5_stage_V.done ]; then
  bash scripts/doom_k25_valsel_r5.sh > /tmp/doom_k25_valsel.log 2>&1
  if grep -q "DOOM K25 VALSEL DONE" /tmp/doom_k25_valsel.log; then
    touch /tmp/r5_stage_V.done
  else
    echo "stage V FAILED; continuing"
  fi
fi

# ---- stage K10: per-k CLR at k=10 (300k steps, val-selected) ----
if [ ! -f /tmp/r5_stage_K10.done ]; then
  KS=10 bash scripts/karel_k_ablation_clr_r5.sh \
      > /tmp/karel_ablation_clr5_k10.log 2>&1
  if grep -q "K ABLATION CLR R5 DONE" /tmp/karel_ablation_clr5_k10.log; then
    mkdir -p results/r5/karel_k_ablation_clr
    for M in synthesis_baseline summarizer; do
      for D in train_dir/karel25k_${M}_k10_clr5 \
               train_dir/karel25k_${M}_k10_clr5_s234; do
        [ -d "$D" ] || continue
        f=$(ls -t $D/eval/out_*_test.log 2>/dev/null | head -1)
        [ -n "$f" ] && cp "$f" \
          results/r5/karel_k_ablation_clr/$(basename $D)_test.log
        for v in $D/eval_val/out_*_val.log; do
          [ -e "$v" ] && cp "$v" \
            results/r5/karel_k_ablation_clr/$(basename $D)_$(basename "$v")
        done
      done
    done
    touch /tmp/r5_stage_K10.done
  else
    echo "stage K10 FAILED"
  fi
fi

echo "ROUND5 POST CHAIN DONE"
