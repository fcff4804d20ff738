"""Cooperative TPU pause protocol (utils/tpu_coord.py): bench <-> chain
coordination that replaces the r4 contended-record-with-footnote."""

import os
import threading
import time

import pytest

from demo2program_tpu.utils import tpu_coord


@pytest.fixture(autouse=True)
def _isolated_pause_files(tmp_path, monkeypatch):
    monkeypatch.setattr(tpu_coord, "PAUSE_FILE",
                        str(tmp_path / "tpu_pause"))
    monkeypatch.setattr(tpu_coord, "PAUSED_MARKER_FMT",
                        str(tmp_path / "tpu_paused_%d"))
    monkeypatch.setattr(tpu_coord, "POLL_SEC", 0.05)
    yield


def test_pause_point_noop_without_request():
    t0 = time.time()
    assert tpu_coord.pause_point() is False
    assert time.time() - t0 < 0.5


def test_pause_point_parks_acks_and_resumes():
    tpu_coord.request_pause()
    synced = []
    released = []

    def releaser():
        marker = tpu_coord.PAUSED_MARKER_FMT % os.getpid()
        deadline = time.time() + 5
        while not os.path.exists(marker):
            assert time.time() < deadline, "pause never acked"
            time.sleep(0.02)
        released.append(True)
        tpu_coord.release_pause()

    t = threading.Thread(target=releaser)
    t.start()
    paused = tpu_coord.pause_point(sync_fn=lambda: synced.append(True))
    t.join()
    assert paused is True
    assert synced == [True], "sync_fn must run once before the ack"
    assert released == [True]
    # marker cleaned up on resume
    assert not os.path.exists(tpu_coord.PAUSED_MARKER_FMT % os.getpid())


def test_stale_pause_file_is_ignored():
    tpu_coord.request_pause()
    old = time.time() - tpu_coord.STALE_PAUSE_SEC - 10
    os.utime(tpu_coord.PAUSE_FILE, (old, old))
    assert tpu_coord.pause_point() is False  # crashed bench can't wedge us
    tpu_coord.release_pause()


def test_wait_for_quiet_sees_parked_contender(monkeypatch):
    fake_pid = 999999999  # not a real process; we fake the contender scan
    monkeypatch.setattr(tpu_coord, "contender_pids",
                        lambda names=None: [fake_pid])
    try:
        quiet, busy = tpu_coord.wait_for_quiet(timeout_sec=0.3, poll=0.05)
        assert quiet is False and busy == [fake_pid]
        # contender parks -> quiet
        with open(tpu_coord.PAUSED_MARKER_FMT % fake_pid, "w") as f:
            f.write("x")
        quiet, busy = tpu_coord.wait_for_quiet(timeout_sec=1, poll=0.05)
        assert quiet is True and busy == []
    finally:
        tpu_coord.release_pause()


def test_wait_for_quiet_no_contenders():
    monkey = tpu_coord.contender_pids  # real scan: none of the CLI names
    try:
        quiet, busy = tpu_coord.wait_for_quiet(timeout_sec=1, poll=0.05)
    finally:
        tpu_coord.release_pause()
    del monkey
    assert isinstance(quiet, bool)


def test_pause_exempt_env_ignores_request(monkeypatch):
    """D2P_TPU_PAUSE_EXEMPT=1 lets the pause requester's own workload run
    through a live pause request (scripts/run_p2_interleaved.sh)."""
    tpu_coord.request_pause()
    monkeypatch.setenv("D2P_TPU_PAUSE_EXEMPT", "1")
    try:
        assert tpu_coord.pause_point() is False
        assert not os.path.exists(
            tpu_coord.PAUSED_MARKER_FMT % os.getpid())
    finally:
        tpu_coord.release_pause()
