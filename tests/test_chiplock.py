"""Stale-lock handling for the chip-contention guard (ADVICE r4, medium).

A quality run hard-killed at round end never removes its RUNNING lock; the
guard must recognise a dead pid (or an ancient mtime) and ignore/clean the
lock instead of tainting every future bench/A-B artifact.
"""

import os
import time

from langsplat_tpu.utils import chiplock


def _make_lock(tmp_path, name, pid):
    ws = tmp_path / name
    ws.mkdir()
    lock = ws / "RUNNING"
    lock.write_text(f"pid={pid} t0={time.time():.0f} stages=all\n")
    return lock


def test_live_lock_is_reported(tmp_path):
    lock = _make_lock(tmp_path, ".quality_ws_live", os.getpid())
    assert chiplock.active_quality_locks(str(tmp_path)) == [str(lock)]
    assert lock.exists()  # live locks are never removed


def test_dead_pid_lock_is_stale_and_cleaned(tmp_path):
    # fork a child that exits immediately: a real, certainly-dead pid
    pid = os.fork()
    if pid == 0:
        os._exit(0)
    os.waitpid(pid, 0)
    lock = _make_lock(tmp_path, ".quality_ws_dead", pid)
    assert chiplock.active_quality_locks(str(tmp_path)) == []
    assert not lock.exists()


def test_dead_pid_lock_kept_when_remove_disabled(tmp_path):
    pid = os.fork()
    if pid == 0:
        os._exit(0)
    os.waitpid(pid, 0)
    lock = _make_lock(tmp_path, ".quality_ws_dead2", pid)
    assert chiplock.active_quality_locks(str(tmp_path),
                                         remove_stale=False) == []
    assert lock.exists()


def test_ancient_lock_is_stale_even_with_live_pid(tmp_path):
    lock = _make_lock(tmp_path, ".quality_ws_old", os.getpid())
    old = time.time() - chiplock.MAX_AGE_S - 60
    os.utime(lock, (old, old))
    assert chiplock.active_quality_locks(str(tmp_path)) == []


def test_malformed_lock_is_stale(tmp_path):
    ws = tmp_path / ".quality_ws_bad"
    ws.mkdir()
    (ws / "RUNNING").write_text("no pid recorded here\n")
    assert chiplock.active_quality_locks(str(tmp_path)) == []
