"""Progress reporting with elapsed/ETA.

Analogue of ProgressReporter (/root/reference/core/util.cpp:396-448):
a '+' bar sized to the terminal, updated per work unit, with elapsed
seconds and an ETA once the rate stabilizes. Here one work unit is one
wavefront chunk rather than one camera sample.
"""
from __future__ import annotations

import sys
import time


class ProgressReporter:
    def __init__(self, total_work: int, title: str, bar_length: int = 48,
                 out=None, enabled: bool = True):
        self.total = max(1, int(total_work))
        self.title = title
        self.bar_length = bar_length
        self.done_work = 0
        self.start = time.time()
        self.out = out or sys.stderr
        self.enabled = enabled
        self._last_plusses = -1
        if enabled:
            self._draw()

    def update(self, num: int = 1):
        self.done_work += num
        if self.enabled:
            self._draw()

    def _draw(self):
        frac = min(1.0, self.done_work / self.total)
        plusses = int(round(frac * self.bar_length))
        elapsed = time.time() - self.start
        eta = elapsed / frac - elapsed if frac > 0 else 0.0
        bar = "+" * plusses + " " * (self.bar_length - plusses)
        msg = (f"\r{self.title}: [{bar}] "
               f"({elapsed:.1f}s|{eta:.1f}s)  ")
        self.out.write(msg)
        self.out.flush()
        self._last_plusses = plusses

    def done(self):
        self.done_work = self.total
        if self.enabled:
            self._draw()
            self.out.write("\n")
            self.out.flush()
