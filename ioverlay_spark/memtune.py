"""Allocator tuning for slow-demand-paging hosts.

On virtualized hosts (measured here: first-touch page faults at ~0.04-0.07
GiB/s vs >100 GiB/s retouch — ~50 us per 4 KiB fault), glibc's default policy
of mmap()ing every allocation above ~128 KiB and munmap()ing it on free makes
vectorized kernels page-fault their large numpy temporaries on EVERY call: a
single 8.4 M-segment ingest measured 70 s cold vs 2 s with a warm heap.

Raising M_MMAP_THRESHOLD and M_TRIM_THRESHOLD keeps large buffers on the brk
heap, so pages are faulted once per process high-water mark and reused across
kernel calls — the same reason long-lived Spark python workers
(spark.python.worker.reuse) amortize beautifully once tuned. Memory cost:
RSS holds the high-water mark instead of shrinking between calls.

Applied at package import (see __init__.py); opt out with
IOVERLAY_NO_MALLOC_TUNE=1. No-op on non-glibc platforms.
"""
from __future__ import annotations

import os

_done = False


def tune_allocator() -> bool:
    """Raise glibc M_MMAP_THRESHOLD / M_TRIM_THRESHOLD to 1 GiB. Idempotent.
    Returns True when the tuning was applied."""
    global _done
    if _done:
        return True
    if os.environ.get("IOVERLAY_NO_MALLOC_TUNE"):
        return False
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        # M_MMAP_THRESHOLD = -3, M_TRIM_THRESHOLD = -1 (glibc malloc.h)
        ok = libc.mallopt(-3, 1 << 30) == 1 and libc.mallopt(-1, 1 << 30) == 1
        _done = bool(ok)
        return _done
    except Exception:
        return False
