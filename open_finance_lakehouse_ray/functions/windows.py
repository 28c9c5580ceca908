"""Pure-Python event-time window / watermark arithmetic — the JVM-free
semantic mirror, copied as a *discipline* from the reference
(``/root/reference/ofl/streaming/windows.py:1-28``: the window math is
reimplemented outside Spark so the arithmetic is testable without the
engine; we mirror it outside Ray).

Semantics pinned (matching ``windows.py:73-149`` of the reference):

- Tumbling window ``[floor(t/w)*w, +w)`` floored on the epoch in
  MICROSECONDS; a timestamp exactly on a boundary belongs to the LATER
  window.
- Watermark = ``max_event_time_seen - delay``, monotonically
  non-decreasing, applied with one-batch lag (events of batch N are
  filtered by the watermark established through batch N-1).
- Late = STRICTLY before the watermark; an event exactly ON the
  watermark survives.
- A window is emittable once ``watermark >= window_end`` (append-mode
  finalization).
"""

from __future__ import annotations

from dataclasses import dataclass, field


def window_start(ts_us: int, width_us: int) -> int:
    """Epoch-floored tumbling window start; boundary ts -> later window."""
    return (ts_us // width_us) * width_us


def window_end(ts_us: int, width_us: int) -> int:
    return window_start(ts_us, width_us) + width_us


def is_late(ts_us: int, watermark_us: int | None) -> bool:
    """Strictly before the watermark is late; equal survives."""
    return watermark_us is not None and ts_us < watermark_us


def is_emittable(window_end_us: int, watermark_us: int | None) -> bool:
    return watermark_us is not None and watermark_us >= window_end_us


@dataclass
class WatermarkState:
    """Monotone watermark with one-batch application lag."""

    delay_us: int
    max_event_us: int | None = None
    _applied: int | None = field(default=None, repr=False)

    @property
    def current(self) -> int | None:
        """The watermark applied to the CURRENT batch (last batch's max)."""
        return self._applied

    def advance(self, batch_max_event_us: int | None) -> None:
        """Fold one batch's max event time in; takes effect NEXT batch."""
        if self.max_event_us is not None:
            self._applied = self.max_event_us - self.delay_us
        if batch_max_event_us is not None and (
            self.max_event_us is None or batch_max_event_us > self.max_event_us
        ):
            self.max_event_us = batch_max_event_us
