#!/usr/bin/env python3
"""Run a command under a progress watchdog, killing + relaunching on stall.

Why: the axon TPU tunnel intermittently wedges a client mid-transfer —
the process parks in futex_do_wait with ~zero CPU while the chip itself
stays healthy (fresh clients' compiles/transfers work; measured
2026-08-20: an evaler and a trainer each hung >25 min, every probe from
a new process passed). There is no client-side timeout in the stack, so
a wedged process waits forever. Every long-running command in this repo
is safe to kill + relaunch: trainers auto-resume bit-exactly from their
latest checkpoint (train/trainer.py resume path) and evalers skip
completed out_*.log artifacts — so the right recovery is mechanical.

Usage:
  watchdog_run.py --stale 1500 --watch 'train_dir/x/metrics.jsonl' \
      --watch 'train_dir/x/eval*/out_*' [--retries 3] -- cmd arg...

Progress = the newest mtime among files matching any --watch glob (plus
process start). If no progress for --stale seconds, the child's process
group is killed (TERM, then KILL) and the command relaunched, up to
--retries times. Exits with the child's exit code; 124 if retries are
exhausted by stalls.
"""
import argparse
import glob
import os
import signal
import subprocess
import sys
import time


def newest_mtime(patterns):
    newest = 0.0
    for pat in patterns:
        for path in glob.glob(pat):
            try:
                newest = max(newest, os.path.getmtime(path))
            except OSError:
                pass
    return newest


def run_once(cmd, patterns, stale_sec, poll_sec):
    """Returns (exit_code|None, stalled: bool)."""
    child = subprocess.Popen(cmd, start_new_session=True)

    def forward(signum, _frame):
        # an outer `timeout`/TERM must not orphan the child's session
        try:
            os.killpg(child.pid, signal.SIGTERM)
        except ProcessLookupError:
            pass
        time.sleep(3)
        try:
            os.killpg(child.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        sys.exit(128 + signum)

    signal.signal(signal.SIGTERM, forward)
    signal.signal(signal.SIGINT, forward)
    started = time.time()
    while True:
        try:
            code = child.wait(timeout=poll_sec)
            return code, False
        except subprocess.TimeoutExpired:
            pass
        if os.path.exists("/tmp/tpu_pause"):
            # a cooperative pause (bench / interleave, utils/tpu_coord.py)
            # parks the child on purpose — that is not a stall
            started = time.time()
            continue
        progress = max(newest_mtime(patterns), started)
        if time.time() - progress > stale_sec:
            print(f"[watchdog] no progress for {stale_sec}s; killing pgid "
                  f"{child.pid}", file=sys.stderr, flush=True)
            for sig in (signal.SIGTERM, signal.SIGKILL):
                try:
                    os.killpg(child.pid, sig)
                except ProcessLookupError:
                    break
                time.sleep(5)
            try:
                child.wait(timeout=30)
            except subprocess.TimeoutExpired:
                pass
            return None, True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stale", type=int, default=1500,
                    help="seconds without progress before the kill (default "
                         "25 min: > the worst legitimate silent window, the "
                         "doom HBM cache push + first XLA compile)")
    ap.add_argument("--watch", action="append", default=[],
                    help="glob whose files' mtimes count as progress")
    ap.add_argument("--retries", type=int, default=3)
    ap.add_argument("--poll", type=int, default=30)
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given")

    for attempt in range(args.retries + 1):
        code, stalled = run_once(cmd, args.watch, args.stale, args.poll)
        if not stalled:
            sys.exit(code)
        print(f"[watchdog] stall #{attempt + 1}; "
              f"{'relaunching' if attempt < args.retries else 'giving up'}",
              file=sys.stderr, flush=True)
    sys.exit(124)


if __name__ == "__main__":
    main()
