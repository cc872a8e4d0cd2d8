"""Bench/trainer lockfile handshake (utils/benchlock.py).

Protects the driver-captured headline bench from this repo's own background
training queue: BENCH_r02 under-reported 0.735x real-time because a live
trainer time-sliced the single TPU chip during `python bench.py`.
"""

import os
import threading
import time

import pytest

from pointfoot_tpu.utils import benchlock


@pytest.fixture
def lockdir(tmp_path, monkeypatch):
    lock = str(tmp_path / "bench_lock")
    monkeypatch.setenv("POINTFOOT_BENCH_LOCK", lock)
    yield lock


def test_heartbeat_fast_path_without_lock(lockdir):
    assert benchlock.trainer_heartbeat() == 0.0
    assert not os.path.exists(lockdir + f".ack.{os.getpid()}")


def test_quiesce_no_trainer(lockdir):
    assert benchlock.quiesce(timeout_s=5.0) == "no_trainer"
    assert os.path.exists(lockdir)  # bench holds the lock
    benchlock.release()
    assert not os.path.exists(lockdir)


def test_trainer_pauses_until_release(lockdir):
    benchlock.trainer_register()
    drained = []
    paused_s = []

    def trainer():
        paused_s.append(benchlock.trainer_heartbeat(
            drain=lambda: drained.append(True)))

    # bench takes the lock, trainer heartbeat must ack + block
    cond = benchlock.quiesce(timeout_s=0.1)  # trainer not yet in heartbeat
    assert cond == "timeout_no_ack"
    t = threading.Thread(target=trainer)
    t.start()
    deadline = time.time() + 10
    while not os.path.exists(lockdir + f".ack.{os.getpid()}") and time.time() < deadline:
        time.sleep(0.05)
    assert os.path.exists(lockdir + f".ack.{os.getpid()}"), "trainer never acked"
    assert drained, "trainer must drain device work before acking"
    assert t.is_alive(), "trainer must stay paused while the lock is held"
    benchlock.release()
    t.join(timeout=10)
    assert not t.is_alive()
    assert paused_s and paused_s[0] > 0.0
    assert not os.path.exists(lockdir + f".ack.{os.getpid()}")
    benchlock.trainer_unregister()


def test_quiesce_sees_ack(lockdir):
    benchlock.trainer_register()
    stop = threading.Event()

    def trainer():
        while not stop.is_set():
            benchlock.trainer_heartbeat()
            time.sleep(0.02)

    t = threading.Thread(target=trainer)
    t.start()
    try:
        assert benchlock.quiesce(timeout_s=10.0) == "trainer_paused"
    finally:
        benchlock.release()
        stop.set()
        t.join(timeout=10)
        benchlock.trainer_unregister()


def test_stale_lock_does_not_hang_trainer(lockdir, monkeypatch):
    # a bench that died without cleanup must not stall training forever
    monkeypatch.setenv("BENCH_LOCK_MAX_PAUSE_S", "0.2")
    with open(lockdir, "w") as f:
        f.write("999999")  # not a live pid, never releases
    paused = benchlock.trainer_heartbeat()
    assert 0.0 < paused < 5.0
