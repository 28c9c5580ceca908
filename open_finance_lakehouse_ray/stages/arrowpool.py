"""Right-size Arrow's global thread pools inside Ray task kernels.

Arrow sizes its CPU and IO pools to the machine's hardware concurrency
(32 here), and Ray map_batches tasks run one per CPU — so a 32-way file
stage (compact bins, per-block stats writes) runs 32 worker processes
each spinning a 32-thread Arrow pool: ~1000 runnable threads for 32
cores. On an idle host that oversubscription costs ~30% (measured on the
compact fan-out: 1.13–1.33 s default vs 0.78–0.84 s capped, round-5
profile); on a loaded shared host it is the variance amplifier behind
compact's 1.1↔9.7 s driver-bench swing (round-4 verdict). Task-side
kernels wrap their Arrow work in :func:`capped_arrow_threads`; the
driver (and any caller outside a task) keeps the full default pools.
"""

from __future__ import annotations

import functools
from contextlib import contextmanager

import pyarrow as pa

TASK_ARROW_THREADS = 2


@contextmanager
def capped_arrow_threads(n: int = TASK_ARROW_THREADS):
    """Temporarily cap Arrow's CPU and IO pools (restored on exit —
    worker processes are reused across pipeline stages, and other stages'
    kernels must see whatever default they expect). Resizing is a cheap
    pool-size swap, not a teardown; per-task overhead is negligible
    against a single parquet read or zstd write."""
    old_cpu = pa.cpu_count()
    old_io = pa.io_thread_count()
    pa.set_cpu_count(n)
    pa.set_io_thread_count(max(2, n))
    try:
        yield
    finally:
        pa.set_cpu_count(old_cpu)
        pa.set_io_thread_count(old_io)


def capped_task(fn):
    """Decorator form for whole task-side kernels (map_batches /
    map_groups callables that read or write parquet per call)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with capped_arrow_threads():
            return fn(*args, **kwargs)

    return wrapper
