"""Wall-clock phase instrumentation.

Counterpart of the reference ``timed`` decorator
(reference: nqs/nqs/infrastructure/timed_decorator.py:4-13), plus a context
manager that blocks on JAX async dispatch so device phases measure real time.
"""

from __future__ import annotations

import functools
import time

import jax


def timed(fn):
    """Append elapsed wall seconds to the function's return tuple."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        start = time.perf_counter()
        result = fn(*args, **kwargs)
        elapsed = time.perf_counter() - start
        if isinstance(result, tuple):
            return (*result, elapsed)
        return result, elapsed

    return wrapper


class Timer:
    """``with Timer() as t: ...`` then read ``t.elapsed`` (seconds).

    ``block_on`` (a pytree of jax arrays) is awaited before the clock stops,
    so asynchronously dispatched device work is fully accounted.
    """

    def __init__(self, block_on=None):
        self._block_on = block_on
        self.elapsed = float("nan")

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._block_on is not None:
            jax.block_until_ready(self._block_on)
        self.elapsed = time.perf_counter() - self._start
        return False

    def block_on(self, tree):
        self._block_on = tree
        return tree
