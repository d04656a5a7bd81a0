"""Section timers for profiling and latency benchmarking.

Parity: reference utils/timer.py:43-180. On TPU, callers must ensure device
work is finished (jax.block_until_ready) before `stop()` for honest numbers.
"""
import time
from collections import defaultdict


class Timer:
    def __init__(self, activate: bool = False):
        self.activated = activate
        self._starts = {}
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    def activate(self):
        self.activated = True

    def deactivate(self):
        self.activated = False

    def __call__(self, name: str):
        return _Section(self, name)

    def start(self, name: str):
        if self.activated:
            self._starts[name] = time.perf_counter()

    def stop(self, name: str):
        if self.activated and name in self._starts:
            self.totals[name] += time.perf_counter() - self._starts.pop(name)
            self.counts[name] += 1

    def avg_ms(self, name: str) -> float:
        if not self.counts[name]:
            return 0.0
        return self.totals[name] / self.counts[name] * 1e3

    def clear(self):
        self._starts.clear()
        self.totals.clear()
        self.counts.clear()


class _Section:
    def __init__(self, timer: Timer, name: str):
        self.timer, self.name = timer, name

    def __enter__(self):
        self.timer.start(self.name)
        return self

    def __exit__(self, *exc):
        self.timer.stop(self.name)
        return False
