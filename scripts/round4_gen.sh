#!/bin/bash
# Round-4 dataset regeneration (post-wipe): karel_25k first (shortest job,
# alone on the 1-core host), then the doom_main 4-shard gen. Idempotent and
# PID-guarded (ADVICE r3 medium): a live generator is never doubled up.
# Launch detached:
#   setsid nohup bash scripts/round4_gen.sh > /tmp/r4_gen.log 2>&1 < /dev/null &
set -x
if [ -f /tmp/r4_gen.pid ] && kill -0 "$(cat /tmp/r4_gen.pid)" 2>/dev/null \
   && [ "$(cat /tmp/r4_gen.pid)" != "$$" ]; then
  echo "another round4_gen.sh is live; refusing to double up"
  exit 1
fi
echo $$ > /tmp/r4_gen.pid
cd /root/repo

# ---- karel_25k (25k/5k/5k -> 35,000 ids; seed 123, bit-identical) ----
if ! [ -f datasets/karel_25k/id.txt ] \
   || [ "$(wc -l < datasets/karel_25k/id.txt)" -ne 35000 ]; then
  rm -rf datasets/karel_25k
  python -m demo2program_tpu.cli.generator_cli --dir_name karel_25k \
      > /tmp/karel_gen.log 2>&1
fi
[ -f datasets/karel_25k/id.txt ] || { echo "karel gen failed"; exit 1; }
echo "KAREL 25K READY"

# ---- doom_main shards (guarded fork; survives this wrapper) ----
if grep -q "DOOM MAIN GEN R3C DONE" /tmp/doom_gen_r4.log 2>/dev/null; then
  echo "doom gen already complete"
elif [ -f /tmp/doom_gen.pid ] && kill -0 "$(cat /tmp/doom_gen.pid)" 2>/dev/null; then
  echo "doom gen already live (pid $(cat /tmp/doom_gen.pid)); not relaunching"
else
  setsid nohup nice -n 19 bash scripts/doom_main_gen_r3c.sh \
      > /tmp/doom_gen_r4.log 2>&1 < /dev/null &
  echo $! > /tmp/doom_gen.pid
fi
echo "ROUND4 GEN WRAPPER DONE"
