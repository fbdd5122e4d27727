"""Statistics store + stage timers (reference src/utils/statistics.h, timer.h).

String-keyed values, emitted sorted as key=value lines like the reference's
std::map-backed Statistics::toString."""

import time


def _fmt(v):
    if isinstance(v, float):
        return f"{v:g}"
    return str(v)


class Statistics:
    def __init__(self):
        self._stats = {}

    def put(self, key, value):
        self._stats[key] = value

    def to_string(self):
        return "".join(f"{k}={_fmt(v)}\n" for k, v in sorted(self._stats.items()))


class StopWatch:
    def __init__(self):
        self.elapsed = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self.elapsed += time.perf_counter() - self._t0
            self._t0 = None
        return self.elapsed
