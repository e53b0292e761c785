"""Per-key timing SPLITS the bench harness reads back after running a
scenario — the ``train_once_sec`` discipline generalized (BASELINE.md's
round-14 adjudication: when new covered behavior is folded into an
EXISTING bench key's timed scenario, the headline row moves for
structural reasons and stops being mechanically comparable across
rounds; recording the phase's own wall seconds keeps it comparable).

Scenario functions wrap a structurally-separate phase (the
retention-path retire inside the incremental-index keys) in
``timed("<key>.retire_sec")``; ``bench.py`` snapshots ``splits`` after
each key run and publishes the per-key minimum across passes in the
detail artifact, next to ``train_once_sec``/``stream_floor_sec``.

Driver-local wall clock only — never distributed state, never read by
any query result (oracle-paired outputs stay deterministic).
"""
from __future__ import annotations

import time
from contextlib import contextmanager

#: name -> seconds, overwritten per invocation (a scenario runs its
#: retire phase once; re-running the scenario re-records it).
splits: dict[str, float] = {}


@contextmanager
def timed(name: str):
    """Record the with-block's wall seconds under ``name``."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        splits[name] = round(time.perf_counter() - t0, 3)
