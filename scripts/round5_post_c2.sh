#!/bin/bash
# Round-5 stretch queue #2: after the post-C queue (ifelse v3) finishes,
# run the per-k 1M-step extension (scripts/karel_k_ablation_ext1m_r5.sh)
# — the budget-hypothesis test for the remaining per-k gap. Marker:
# /tmp/r5_stage_X1M.done. Launch detached:
#   setsid nohup bash scripts/round5_post_c2.sh \
#       > /tmp/r5_post_c2.log 2>&1 < /dev/null &
set -x
if ! mkdir /tmp/r5_postc2.lock 2>/dev/null; then
  echo "post-C2 already ran/running"; exit 1
fi
cd /root/repo
until grep -q "ROUND5 POST C DONE" /tmp/r5_post_c.log 2>/dev/null; do
  sleep 60
done
if [ ! -f /tmp/r5_stage_X1M.done ]; then
  bash scripts/karel_k_ablation_ext1m_r5.sh > /tmp/karel_ext1m.log 2>&1
  if grep -q "K ABLATION EXT1M DONE" /tmp/karel_ext1m.log; then
    touch /tmp/r5_stage_X1M.done
  else
    echo "stage X1M FAILED"
  fi
fi
echo "ROUND5 POST C2 DONE"
