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
        # bounded deque of recent action timestamps (reference: rate_limiter.py:23)
        self._actions: deque[float] = deque(maxlen=action_limit)

    def _prune(self) -> None:
        cutoff = self._clock() - self.timespan
        while self._actions and self._actions[0] <= cutoff:
            self._actions.popleft()

    @property
    def count_in_window(self) -> int:
        self._prune()
        return len(self._actions)

    def would_block(self) -> bool:
        return self.count_in_window >= self.action_limit

    def perform_action(self) -> None:
        """Block until under limit, then record the action."""
        while self.would_block():
            self._sleep(self.wait_time)
        self._actions.append(self._clock())

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
