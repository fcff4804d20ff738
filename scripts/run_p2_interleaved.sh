#!/bin/bash
# Interleave stage P2 (per-k CLR k=5 @300k + k=3 ext300) into the ~6 h
# doom stage-C training window instead of queueing it ~12 h out.
#
# Mechanism: request the cooperative pause (utils/tpu_coord.py) so the
# doom stage runner parks at its next chunk boundary with the chip
# drained, run the karel suite exclusively (D2P_TPU_PAUSE_EXEMPT=1 so the
# suite ignores the pause file it is running under), then release. HBM
# fits both clients: the parked doom runner holds its 9.6 GB device cache
# while the karel chunked loop adds ~0.1 GB data + ~2 GB working set on
# the 16 GB v5e chip (two coexisting clients have precedent: the r4 bench
# measured alongside a live trainer).
#
# On completion: harvests like round5_chain_b.sh's harvest_ablation(5)
# and touches /tmp/r5_stage_P2.done so the chain skips P2 when stage C
# finishes. A pause refresher keeps the request younger than
# STALE_PAUSE_SEC for suites longer than an hour.
set -x
cd /root/repo

if ! mkdir /tmp/r5_p2il.lock 2>/dev/null; then
  echo "interleave already ran/running"; exit 1
fi

python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
from demo2program_tpu.utils import tpu_coord
quiet, busy = tpu_coord.wait_for_quiet(300)
print("quiet:", quiet, "busy:", busy)
sys.exit(0 if quiet else 1)
EOF
if [ $? -ne 0 ]; then
  echo "doom trainer never parked; aborting interleave"
  python -c "import sys; sys.path.insert(0, '/root/repo'); \
from demo2program_tpu.utils import tpu_coord; tpu_coord.release_pause()"
  rmdir /tmp/r5_p2il.lock
  exit 1
fi

( while true; do touch /tmp/tpu_pause; sleep 300; done ) &
REFRESH=$!

export D2P_TPU_PAUSE_EXEMPT=1
KS=5 bash scripts/karel_k_ablation_clr_r5.sh \
    > /tmp/karel_ablation_clr5_k5.log 2>&1
STATUS=$?

kill $REFRESH 2>/dev/null
python -c "import sys; sys.path.insert(0, '/root/repo'); \
from demo2program_tpu.utils import tpu_coord; tpu_coord.release_pause()"

if [ $STATUS -eq 0 ] \
   && grep -q "K ABLATION CLR R5 DONE" /tmp/karel_ablation_clr5_k5.log; then
  # harvest exactly like round5_chain_b.sh harvest_ablation(5)
  mkdir -p results/r5/karel_k_ablation_clr
  for M in synthesis_baseline summarizer; do
    for D in train_dir/karel25k_${M}_k5_clr5 \
             train_dir/karel25k_${M}_k5_clr5_s234; do
      [ -d "$D" ] || continue
      sfx=$(basename "$D" | sed "s/.*clr5//")
      f=$(ls -t $D/eval/out_*_test.log 2>/dev/null | head -1)
      [ -n "$f" ] && cp "$f" \
        results/r5/karel_k_ablation_clr/${M}_k5_clr5${sfx}_test.log
      for v in $D/eval_val/out_*_val.log; do
        [ -e "$v" ] && cp "$v" \
          results/r5/karel_k_ablation_clr/${M}_k5${sfx}_$(basename "$v")
      done
    done
  done
  touch /tmp/r5_stage_P2.done
  echo "P2 INTERLEAVE DONE"
else
  echo "P2 INTERLEAVE FAILED (suite status $STATUS); chain will retry P2"
fi
