"""Stats registry: (category, name) counters with a pretty-printed table.

The reborn analogue of the reference's statistics system
(/root/reference/core/pbrt.h:291-321 declarations,
/root/reference/core/util.cpp:186-285 registry + printing): statics
declared at hot sites, merged by (category, name), printed after the
render. Here device kernels return counter sums as extra outputs (no
global mutable state under jit); the host accumulates them in this
registry and prints the same style of table, including the reference's
K/M/B suffix formatting (core/util.cpp:228-262) and ratio/percentage
entries.
"""
from __future__ import annotations

from collections import OrderedDict


def _suffixed(v: float) -> str:
    """K/M/B formatting as in StatsPrintVal (core/util.cpp:228-246)."""
    if v != int(v):
        return f"{v:.3f}"
    v = int(v)
    if v >= 1_000_000_000:
        return f"{v / 1e9:.3f}B"
    if v >= 1_000_000:
        return f"{v / 1e6:.3f}M"
    if v >= 1_000:
        return f"{v / 1e3:.3f}K"
    return str(v)


class StatsRegistry:
    """Accumulates counters, ratios, and percentages keyed by
    (category, name), mirroring StatsCounter/StatsRatio/StatsPercentage
    (core/pbrt.h:291-321)."""

    def __init__(self):
        self._counters: OrderedDict[tuple, float] = OrderedDict()
        self._ratios: OrderedDict[tuple, list] = OrderedDict()

    def add(self, category: str, name: str, amount: float = 1.0):
        key = (category, name)
        self._counters[key] = self._counters.get(key, 0.0) + float(amount)

    def add_ratio(self, category: str, name: str, num: float, denom: float):
        key = (category, name)
        cur = self._ratios.setdefault(key, [0.0, 0.0])
        cur[0] += float(num)
        cur[1] += float(denom)

    def merge(self, other: "StatsRegistry"):
        for k, v in other._counters.items():
            self._counters[k] = self._counters.get(k, 0.0) + v
        for k, (n, d) in other._ratios.items():
            self.add_ratio(k[0], k[1], n, d)

    def get(self, category: str, name: str) -> float:
        return self._counters.get((category, name), 0.0)

    def format_table(self) -> str:
        """StatsPrint layout (core/util.cpp:248-285): grouped by category,
        names aligned, values suffixed."""
        by_cat: OrderedDict[str, list] = OrderedDict()
        for (cat, name), v in self._counters.items():
            by_cat.setdefault(cat, []).append((name, _suffixed(v)))
        for (cat, name), (n, d) in self._ratios.items():
            val = f"{_suffixed(n)}:{_suffixed(d)} ({n / d:.2f}x)" if d \
                else "0:0"
            by_cat.setdefault(cat, []).append((name, val))
        lines = ["Statistics:"]
        for cat, items in by_cat.items():
            lines.append(f"    {cat}")
            width = max(len(n) for n, _ in items)
            for name, val in items:
                lines.append(f"        {name:<{width}}  {val}")
        return "\n".join(lines)

    def print(self, file=None):
        import sys
        print(self.format_table(), file=file or sys.stdout)


# Module-level default registry, merged into by the render driver.
GLOBAL = StatsRegistry()
