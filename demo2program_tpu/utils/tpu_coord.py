"""Cooperative single-tenant TPU scheduling between long-running chains
and the benchmark.

The chip serializes (or wedges) under two clients, so the round-4 official
bench record was taken under contention and published with an embedded
idle reference (VERDICT r4 weak #3). This module replaces that footnote
with coordination: `bench.py` requests the chip by touching PAUSE_FILE;
every trainer/evaler loop calls `pause_point()` between device dispatches,
drains its in-flight work, marks itself paused, and sleeps until the file
disappears. The bench waits (bounded) until every live TPU client is
parked, measures on a quiet chip, then releases.

File protocol (all under /tmp, single-host by design — the reference
framework is single-process too, SURVEY.md §2.6):
  PAUSE_FILE                request: some process wants the chip exclusively
  PAUSED_MARKER_FMT % pid   ack: client <pid> is parked at a safe point
A PAUSE_FILE older than STALE_PAUSE_SEC is ignored (a crashed bench must
not freeze training chains forever).
"""

import os
import time

PAUSE_FILE = "/tmp/tpu_pause"
PAUSED_MARKER_FMT = "/tmp/tpu_paused_%d"
STALE_PAUSE_SEC = 3600
POLL_SEC = 5


def _pause_requested():
    try:
        age = time.time() - os.path.getmtime(PAUSE_FILE)
    except OSError:
        return False
    return age <= STALE_PAUSE_SEC


def pause_point(sync_fn=None):
    """Park here while a pause is requested. Call between device dispatches
    (trainer chunk/step boundaries, evaler batch boundaries). `sync_fn`,
    if given, is called once before acking the pause — pass a cheap
    device->host fetch so the ack means "chip actually quiet", not just
    "host loop parked while dispatched work still runs". Returns True if
    it actually paused (callers reset their throughput windows on it).

    D2P_TPU_PAUSE_EXEMPT=1 makes a process ignore pause requests: set it
    on the workload the pause was requested FOR, e.g. a short
    high-priority suite interleaved into a long training chain's window
    (scripts/run_p2_interleaved.sh) — the long chain parks, the exempt
    suite runs exclusively, the requester releases when done."""
    if os.environ.get("D2P_TPU_PAUSE_EXEMPT"):
        return False
    if not _pause_requested():
        return False
    if sync_fn is not None:
        sync_fn()
    marker = PAUSED_MARKER_FMT % os.getpid()
    with open(marker, "w") as f:
        f.write(str(time.time()))
    try:
        while _pause_requested():
            time.sleep(POLL_SEC)
    finally:
        try:
            os.unlink(marker)
        except OSError:
            pass
    return True


def request_pause():
    """Ask every cooperating TPU client to park (touch/refresh the file)."""
    with open(PAUSE_FILE, "w") as f:
        f.write(str(os.getpid()))


def release_pause():
    try:
        os.unlink(PAUSE_FILE)
    except OSError:
        pass


def contender_pids(names=("trainer_cli", "evaler_cli", "doom_stage_runner",
                          "round5_smoke")):
    """PIDs of OTHER live python processes that plausibly hold the chip.
    Read-only /proc scan; never signals anything."""
    me = os.getpid()
    out = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == me:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode(errors="replace")
        except OSError:
            continue
        if "python" in cmd and any(n in cmd for n in names):
            out.append(int(pid))
    return out


def wait_for_quiet(timeout_sec, poll=10):
    """Request a pause and wait until every contender has either exited or
    acked the pause. Returns (quiet: bool, remaining_contenders: list[int]).
    Caller MUST release_pause() afterwards (also on failure paths)."""
    request_pause()
    deadline = time.time() + timeout_sec
    while True:
        pids = contender_pids()
        busy = [p for p in pids
                if not os.path.exists(PAUSED_MARKER_FMT % p)]
        if not busy:
            return True, []
        if time.time() >= deadline:
            return False, busy
        # keep the request fresh so a long wait never crosses STALE_PAUSE_SEC
        request_pause()
        time.sleep(poll)
