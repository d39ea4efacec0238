"""Control-plane rate limiter (SURVEY.md §2 T4).

Re-expression of the reference's sliding-deque limiter
(weather/utilities/rate_limiter.py:10-95): at most ``action_limit``
actions within any trailing ``timespan`` seconds; when over limit,
sleep ``wait_time`` until under. Decorator composition supported
(stacked limiters, rate_limiter.py:81-95).

This is DRIVER-side admission control for source adapters (the
reference gates Netatmo API calls with 45/10s + 450/h limiters —
start_dtss_host.py:18-22). The data-plane twin for event streams is
``ops.timeseries.sliding_count`` (a range-bounded window).
"""

from __future__ import annotations

import functools
import threading
import time
from collections import deque
from typing import Callable, TypeVar

F = TypeVar("F", bound=Callable)


class RateLimiter:
    def __init__(
        self,
        action_limit: int,
        timespan: float,
        wait_time: float = 1.0,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        if action_limit < 1:
            raise ValueError("action_limit must be >= 1")
        self.action_limit = action_limit
        self.timespan = timespan
        self.wait_time = wait_time
        self._clock = clock
        self._sleep = sleep
        # UNbounded deque of in-window action timestamps: a
        # deque(maxlen=limit) silently evicts the oldest stamp when a
        # concurrent append lands, making the window undercount — the
        # limiter then persistently admits more than action_limit calls.
        # Time-based pruning alone bounds memory to one window's worth.
        self._actions: deque[float] = deque()
        # One adapter's limiter is shared by every collector thread
        # hitting that source (the reference's global API budget), so
        # check-then-append must be atomic.
        self._lock = threading.Lock()

    def _prune(self) -> None:
        cutoff = self._clock() - self.timespan
        while self._actions and self._actions[0] <= cutoff:
            self._actions.popleft()

    @property
    def count_in_window(self) -> int:
        with self._lock:
            self._prune()
            return len(self._actions)

    def would_block(self) -> bool:
        return self.count_in_window >= self.action_limit

    def perform_action(self) -> None:
        """Block until under limit, then record the action."""
        while True:
            with self._lock:
                self._prune()
                if len(self._actions) < self.action_limit:
                    self._actions.append(self._clock())
                    return
            self._sleep(self.wait_time)

    def wrap(self, fn: F) -> F:
        @functools.wraps(fn)
        def inner(*args, **kwargs):
            self.perform_action()
            return fn(*args, **kwargs)

        return inner  # type: ignore[return-value]


def rate_limited(action_limit: int, timespan: float, wait_time: float = 1.0):
    """Decorator form (reference: rate_limiter.py:81-95); stackable."""
    limiter = RateLimiter(action_limit, timespan, wait_time)

    def deco(fn: F) -> F:
        return limiter.wrap(fn)

    return deco
