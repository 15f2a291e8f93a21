"""Cyclic-GC pacing for the extraction hot loop.

The DOM is a parent↔children cyclic graph, so every node is a
GC-tracked container and each dead tree waits for the cyclic collector.
With default thresholds the collector runs every ~700 net allocations —
i.e. many times per parsed page — and measurably dominates: the 1000-doc
eval corpus parses ~1.6x faster with collection paused (BENCH.md).

GcPacer pauses automatic collection and instead runs one gen-0 pass per
`every` processed documents, so dead trees are reclaimed promptly (the
pass cost is proportional to objects allocated since the last tick, not
to the live heap) and peak memory stays bounded by `every` trees. As a
library citizen it restores the caller's GC state on exit and never
forces a full collection.
"""

from __future__ import annotations

import gc


class GcPacer:
    """Context manager: pause automatic cyclic GC, tick() once per
    processed document. Nest-safe (inner pacers leave state alone)."""

    def __init__(self, every: int = 256):
        self.every = every
        self._n = 0
        self._was_enabled = False

    def __enter__(self) -> "GcPacer":
        self._was_enabled = gc.isenabled()
        gc.disable()
        self._n = 0
        return self

    def tick(self) -> None:
        self._n += 1
        if self._n >= self.every:
            self._n = 0
            gc.collect(0)

    def __exit__(self, *exc) -> None:
        gc.collect(0)  # reclaim the tail before handing control back
        if self._was_enabled:
            gc.enable()
