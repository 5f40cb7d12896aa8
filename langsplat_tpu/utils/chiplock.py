"""Chip-contention lock discovery with staleness handling.

quality_run.py drops a ``RUNNING`` file (``pid=<pid> t0=<epoch> stages=...``)
into its workspace while it holds the (single, tunneled) TPU chip; bench.py
stamps its artifact ``contended`` and ab_kernels.py refuses to run while one
exists.  A hard-killed run (SIGKILL at round end) never executes its
``finally`` cleanup, so a lock alone is not proof of contention: a lock whose
recorded pid is no longer alive, or whose file age exceeds ``MAX_AGE_S``, is
stale and must not block future measurements (ADVICE r4, medium).
"""

import glob
import os
import re
import time

# no legitimate quality run exceeds this wall clock; anything older is debris
MAX_AGE_S = 12 * 3600


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def active_quality_locks(repo_root: str, remove_stale: bool = True):
    """Return live RUNNING lock paths under ``repo_root/.quality_ws*``.

    A lock is *live* iff its recorded pid is alive and its mtime is within
    MAX_AGE_S.  Stale locks are deleted (best effort) when ``remove_stale``,
    so a SIGKILLed run cannot permanently poison bench/A-B artifacts.
    """
    live = []
    for lock in glob.glob(os.path.join(repo_root, ".quality_ws*", "RUNNING")):
        try:
            with open(lock) as fh:
                txt = fh.read()
            m = re.search(r"pid=(\d+)", txt)
            pid_ok = bool(m) and _pid_alive(int(m.group(1)))
            fresh = (time.time() - os.path.getmtime(lock)) < MAX_AGE_S
        except OSError:
            continue  # raced with its own cleanup
        if pid_ok and fresh:
            live.append(lock)
        elif remove_stale:
            try:
                os.remove(lock)
            except OSError:
                pass
    return live
