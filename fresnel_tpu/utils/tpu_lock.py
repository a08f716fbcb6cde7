"""Advisory lock serializing TPU users (queue discipline, VERDICT r3 #2).

Round 3's official headline-bench record regressed 3.8x because a training
job was occupying the chip when the driver ran bench.py.  Every long-running
TPU command in cloud/*.sh now wraps itself in `flock <LOCK_PATH> cmd`, and
bench.py acquires the same lock (bounded wait) before compiling/timing, so a
snapshot bench can never race a training segment.

The lock is ADVISORY: a cooperating protocol between this repo's own
processes, not an OS-level GPU mutex.  Lock file lives inside the repo so it
survives nothing (fresh per checkout) and gitignore keeps it untracked.
"""

from __future__ import annotations

import contextlib
import fcntl
import os
import sys
import time

LOCK_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".tpu.lock")


@contextlib.contextmanager
def tpu_lock(timeout_s: float = 1800.0, poll_s: float = 5.0,
             path: str = LOCK_PATH):
    """Hold the advisory TPU lock for the duration of the context.

    Blocks up to `timeout_s` waiting for the current holder (a training
    segment finishes within ~25 min).  On timeout, proceeds WITHOUT the
    lock and warns on stderr — a measurement under contention is better
    than no measurement, and the warning makes the record auditable.
    """
    fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
    acquired = False
    deadline = time.monotonic() + timeout_s
    try:
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                acquired = True
                break
            except BlockingIOError:
                if time.monotonic() >= deadline:
                    print(f"WARNING: TPU lock {path} still held after "
                          f"{timeout_s:.0f}s — proceeding under possible "
                          "contention", file=sys.stderr)
                    break
                time.sleep(poll_s)
        yield acquired
    finally:
        if acquired:
            fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)
