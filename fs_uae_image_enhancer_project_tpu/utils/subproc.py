"""Deadline-safe readiness waits for child processes.

``proc.stdout.readline()`` blocks indefinitely, so a loop like
``while time.time() < deadline: line = proc.stdout.readline()`` only
re-checks its deadline when the child prints. A child that goes silent
(e.g. a sidecar stuck in a multi-minute tunnel iowait stall before its
first log line — docs/DEPLOYMENT.md "Cold start") hangs the parent
forever. This helper pumps stdout on a daemon thread and enforces the
deadline from the consumer side; after the token is seen the pump keeps
draining stdout so the child never blocks on a full pipe.
"""
from __future__ import annotations

import queue
import threading
import time
from typing import List, Tuple


def wait_for_line(proc, token: str, timeout: float) -> Tuple[bool, List[str]]:
    """Wait until a line of ``proc.stdout`` (text mode) contains ``token``.

    Returns ``(ok, lines_seen)``; ``ok`` is False on deadline or EOF
    (child exited / closed stdout). The pump thread stays alive and keeps
    draining stdout after return.
    """
    q: "queue.Queue" = queue.Queue()
    satisfied = threading.Event()

    def pump():
        for line in proc.stdout:
            if satisfied.is_set():
                continue  # post-token lines are discarded, not queued
                # (an hours-long chatty child must not grow parent RSS)
            q.put(line)
        q.put(None)

    threading.Thread(target=pump, daemon=True).start()

    deadline = time.monotonic() + timeout
    lines: List[str] = []
    while True:
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            satisfied.set()
            return False, lines
        try:
            line = q.get(timeout=min(remaining, 5.0))
        except queue.Empty:
            continue
        if line is None:  # EOF
            return False, lines
        lines.append(line)
        if token in line:
            satisfied.set()
            return True, lines
