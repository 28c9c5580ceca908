"""Boundary-case pins for the window/watermark arithmetic mirror — the
reference's own test matrix (tests/test_streaming_windows.py:49-191 over
ofl/streaming/windows.py): epoch flooring, microsecond precision,
boundary-belongs-to-later-window, on-watermark survives, one-batch lag,
monotone watermark."""

from __future__ import annotations

from open_finance_lakehouse_ray.functions import windows as w

MIN = 60_000_000  # 1 minute in us


def test_window_floors_on_epoch():
    assert w.window_start(0, MIN) == 0
    assert w.window_start(MIN - 1, MIN) == 0
    assert w.window_start(MIN, MIN) == MIN  # boundary -> LATER window
    assert w.window_start(MIN + 1, MIN) == MIN
    assert w.window_end(1, MIN) == MIN


def test_microsecond_precision():
    t = 1_700_000_000_123_456
    assert w.window_start(t, MIN) % MIN == 0
    assert w.window_start(t, MIN) <= t < w.window_end(t, MIN)


def test_late_strictly_before_watermark():
    assert w.is_late(99, 100)
    assert not w.is_late(100, 100)  # ON the watermark survives
    assert not w.is_late(101, 100)
    assert not w.is_late(0, None)  # no watermark yet -> nothing late


def test_emittable_when_watermark_reaches_end():
    assert not w.is_emittable(MIN, None)
    assert not w.is_emittable(MIN, MIN - 1)
    assert w.is_emittable(MIN, MIN)
    assert w.is_emittable(MIN, MIN + 1)


def test_watermark_one_batch_lag_and_monotone():
    st = w.WatermarkState(delay_us=2 * MIN)
    assert st.current is None
    st.advance(10 * MIN)  # batch 1
    assert st.current is None  # applies only from NEXT batch
    st.advance(11 * MIN)  # batch 2
    assert st.current == 10 * MIN - 2 * MIN
    st.advance(5 * MIN)  # regressing max must NOT move watermark back
    assert st.current == 11 * MIN - 2 * MIN
    st.advance(None)  # empty batch keeps state
    assert st.current == 11 * MIN - 2 * MIN
    assert st.max_event_us == 11 * MIN
