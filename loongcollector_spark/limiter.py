"""Send-path back-pressure twins — AIMD ConcurrencyLimiter + per-second
RateLimiter (core/collection_pipeline/limiter/ConcurrencyLimiter.{h,cpp},
RateLimiter.{h,cpp}).

SURVEY §2.8 maps the reference's bounded-queue back-pressure to "the
Spark scheduler owns it" for BATCH jobs — true for task scheduling, but
the SENDER side still exists here: streaming foreachBatch sinks and the
pipeline's concurrent sink writer fan out real HTTP/JDBC calls whose
destination can degrade. The reference paces those with an AIMD
concurrency window per destination (additive increase on an all-success
statistics window, multiplicative decrease at 0.8×/0.5× by failure
percentage, and an exponential-backoff "time fallback" probe once the
window hits the minimum). This module is the faithful state-machine
twin with an injectable clock; `tests/test_limiter.py` replays the
reference's own unittest scenarios (ConcurrencyLimiterUnittest.cpp)
against it.

Semantics carried over exactly:

* a statistics window closes after ``statistic_threshold`` outcomes OR
  when ``statistic_interval_s`` seconds elapsed since the window opened
  (AdjustConcurrency, :151-189);
* fail% == 0 → concurrency += 1 (capped at max); fail% ≤ 10 → hold;
  fail% ≤ 40 → slow fallback ×0.8; else fast fallback ×0.5, floored at
  min (AppConfig.cpp:173-175 thresholds);
* decreasing AT the minimum enters time fallback (when enabled):
  ``is_valid_to_pop`` refuses until the current backoff elapses, then
  admits ONE probe and doubles the backoff up to the max; ANY success
  exits fallback and resets the backoff (Increase, :97-121);
* in-flight accounting: ``post_pop``/``on_send_done`` bracket a send,
  and admission requires current concurrency > in-flight.
"""

from __future__ import annotations

import time as _time

# AppConfig.cpp:173-175
NO_FALL_BACK_FAIL_PERCENTAGE = 10
SLOW_FALL_BACK_FAIL_PERCENTAGE = 40


class ConcurrencyLimiter:
    def __init__(
        self,
        description: str = "",
        max_concurrency: int = 80,
        min_concurrency: int = 1,
        time_fallback_duration_ms: int = 0,
        fast_fallback_ratio: float = 0.5,
        slow_fallback_ratio: float = 0.8,
        backoff_multiplier: float = 2.0,
        max_fallback_duration_ms: int = 60000,
        statistic_threshold: int = 10,
        statistic_interval_s: int = 3,
        clock=None,
    ):
        self.description = description
        self.max_concurrency = int(max_concurrency)
        self.min_concurrency = int(min_concurrency)
        self.time_fallback_duration_ms = int(time_fallback_duration_ms)
        self.fast_fallback_ratio = float(fast_fallback_ratio)
        self.slow_fallback_ratio = float(slow_fallback_ratio)
        self.backoff_multiplier = float(backoff_multiplier)
        self.max_fallback_duration_ms = int(max_fallback_duration_ms)
        self.statistic_threshold = int(statistic_threshold)
        self.statistic_interval_s = int(statistic_interval_s)
        self._clock = clock or _time.monotonic

        self.current_concurrency = self.max_concurrency
        self.in_sending = 0
        self._in_time_fallback = False
        self._fallback_current_ms = self.time_fallback_duration_ms
        self._fallback_start: float | None = None
        self._stat_total = 0
        self._stat_fail = 0
        self._stat_window_start: float | None = None

    # --- admission (IsValidToPop / PostPop / OnSendDone) ---------------

    def is_valid_to_pop(self) -> bool:
        if self._in_time_fallback:
            elapsed_ms = (self._clock() - self._fallback_start) * 1000.0
            if elapsed_ms < self._fallback_current_ms:
                return False
            if self.current_concurrency > self.in_sending:
                # admit one probe; exponential backoff for the next
                nxt = int(self._fallback_current_ms * self.backoff_multiplier)
                self._fallback_current_ms = min(
                    nxt, self.max_fallback_duration_ms)
                self._fallback_start = self._clock()
                return True
            return False
        return self.current_concurrency > self.in_sending

    def post_pop(self) -> None:
        self.in_sending += 1

    def on_send_done(self) -> None:
        self.in_sending -= 1

    # --- outcome statistics (OnSuccess / OnFail / AdjustConcurrency) ---

    def on_success(self, now: float | None = None) -> None:
        self._adjust(True, self._clock() if now is None else now)

    def on_fail(self, now: float | None = None) -> None:
        self._adjust(False, self._clock() if now is None else now)

    def _adjust(self, success: bool, now: float) -> None:
        self._stat_total += 1
        if not success:
            self._stat_fail += 1
        if self._stat_window_start is None:
            self._stat_window_start = now
        if not (self._stat_total == self.statistic_threshold
                or now - self._stat_window_start
                > self.statistic_interval_s):
            return
        fail_pct = self._stat_fail * 100 // self._stat_total
        self._stat_total = 0
        self._stat_fail = 0
        self._stat_window_start = now
        if fail_pct == 0:
            self._increase()
        elif fail_pct <= NO_FALL_BACK_FAIL_PERCENTAGE:
            pass  # hold
        elif fail_pct <= SLOW_FALL_BACK_FAIL_PERCENTAGE:
            self._decrease(self.slow_fallback_ratio)
        else:
            self._decrease(self.fast_fallback_ratio)

    def _increase(self) -> None:
        if self._in_time_fallback:
            # any success exits fallback and resets the backoff
            self._in_time_fallback = False
            self._fallback_current_ms = self.time_fallback_duration_ms
        if self.current_concurrency != self.max_concurrency:
            self.current_concurrency += 1

    def _decrease(self, ratio: float) -> None:
        if self.current_concurrency != self.min_concurrency:
            self.current_concurrency = max(
                int(self.current_concurrency * ratio), self.min_concurrency)
        else:
            if self.time_fallback_duration_ms > 0 and not self._in_time_fallback:
                self._in_time_fallback = True
                self._fallback_current_ms = self.time_fallback_duration_ms
                self._fallback_start = self._clock()
            if self.min_concurrency == 0:
                self.current_concurrency = 1

    # --- test hooks (the APSARA_UNIT_TEST_MAIN surface) ----------------

    def in_time_fallback(self) -> bool:
        return self._in_time_fallback

    def set_current_limit(self, limit: int) -> None:
        self.current_concurrency = int(limit)


def paced_send(requests, send, limiter: ConcurrencyLimiter,
               wait=None) -> list:
    """Drive a sequence of send calls through the AIMD window — the seam
    a real deployment wraps around its per-destination HTTP/JDBC sender
    (the reference brackets every flusher send with
    IsValidToPop/PostPop + OnSuccess/OnFail, e.g. FlusherSLS's use of
    the region/project/logstore limiters). ``send(req)`` returns truthy
    on success; admission blocks via ``wait()`` (default: a short real
    sleep; tests inject the fake clock's step). Returns the per-request
    outcomes. Sequential driver-side pacing — the CONCURRENCY window
    still governs because in-flight is bracketed per request, and the
    time-fallback probe behavior is what actually matters for a
    degraded destination."""
    outcomes = []
    wait = wait or (lambda: _time.sleep(0.01))
    for req in requests:
        while not limiter.is_valid_to_pop():
            wait()
        limiter.post_pop()
        try:
            ok = bool(send(req))
        except Exception:
            ok = False
        (limiter.on_success if ok else limiter.on_fail)()
        limiter.on_send_done()
        outcomes.append(ok)
    return outcomes


class RateLimiter:
    """Per-second byte budget (RateLimiter.cpp:26-39): the counter
    resets when the wall second changes; admission refuses only AFTER
    the budget is exceeded (the reference checks ``>`` before adding, so
    one oversized send per second always passes — kept)."""

    def __init__(self, max_send_bytes_per_second: int, clock=None):
        self.max_send_bytes_per_second = int(max_send_bytes_per_second)
        self._clock = clock or _time.time
        self._last_second = None
        self._last_second_bytes = 0

    def is_valid_to_pop(self) -> bool:
        now_s = int(self._clock())
        if now_s != self._last_second:
            self._last_second_bytes = 0
            self._last_second = now_s
        return not self._last_second_bytes > self.max_send_bytes_per_second

    def post_pop(self, size: int) -> None:
        self._last_second_bytes += int(size)
