"""Pause the cyclic garbage collector across a vectorized kernel call.

CPython's generational GC scans every tracked container on collection; a
caller holding millions of small ring arrays/lists (the scalar one-shot API,
the scenario generators, Spark workers mid-batch) makes each pass O(live
objects), and the kernels' numpy temporaries trigger passes constantly —
measured 10x wall on kernel/cluster.cluster_labels with 2M rings alive
(13.9 s -> 1.3 s). The kernels themselves allocate (acyclic) numpy arrays
freed by refcount, so deferring cycle collection across one call is safe and
bounded: the guard re-enables (and the outermost exit collects nothing —
normal allocation pressure resumes the usual schedule).

Reentrant: only the outermost guard toggles; exceptions re-enable.
"""
from __future__ import annotations

import gc
from contextlib import contextmanager

_depth = 0


def gc_paused_fn(fn):
    """Decorator form: run `fn` under gc_paused()."""
    from functools import wraps

    @wraps(fn)
    def wrapper(*args, **kwargs):
        with gc_paused():
            return fn(*args, **kwargs)

    return wrapper


@contextmanager
def gc_paused():
    global _depth
    outer = _depth == 0 and gc.isenabled()
    if outer:
        gc.disable()
    _depth += 1
    try:
        yield
    finally:
        _depth -= 1
        if outer:
            gc.enable()
