"""Per-phase frame profiler — the ``ProfileItem`` analog
(`TestProgram/Program.h:21-32`, `Program.cpp:358-379`): named phase
stopwatches pushed per frame, dumped once per second.  Device work is
bounded with ``jax.block_until_ready`` so phases measure real execution,
not dispatch.  ``jax.profiler`` traces can be captured around any phase
for Perfetto (the Nsight-export analog)."""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class ProfileItem:
    name: str
    start: float = 0.0
    end: float = 0.0

    @property
    def elapsed_ms(self) -> float:
        return (self.end - self.start) * 1000.0


@dataclass
class Profiler:
    """Push per-phase timings; ``report()`` prints at most once per
    ``interval`` seconds (the reference prints once per second,
    `Program.cpp:358-373`)."""

    interval: float = 1.0
    items: list[ProfileItem] = field(default_factory=list)
    _last_report: float = 0.0

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        """Time a phase; pass device arrays via ``sync`` to block on them
        (the analog of the reference's ``cudaDeviceSynchronize()`` "DEBUG"
        sync points, `Program.cpp:297,332`)."""
        item = ProfileItem(name, start=time.perf_counter())
        try:
            yield item
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            item.end = time.perf_counter()
            self.items.append(item)

    def push(self, item: ProfileItem) -> None:
        item.end = time.perf_counter()
        self.items.append(item)

    def report(self, force: bool = False) -> str | None:
        now = time.perf_counter()
        if not force and now - self._last_report < self.interval:
            self.items.clear()
            return None
        self._last_report = now
        lines = ["--- Profile Items ---"]
        for item in self.items:
            lines.append(f"{item.name}\t{item.elapsed_ms:.3f}")
        self.items.clear()
        out = "\n".join(lines)
        print(out)
        return out


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a ``jax.profiler`` trace viewable in Perfetto/TensorBoard —
    the machine-readable successor to the reference's Nsight `aa.xml`."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
