"""ConcurrencyLimiter / RateLimiter twins vs the reference's own
unittest scenarios (core/unittest/pipeline/ConcurrencyLimiterUnittest.cpp
TestLimiter/TestTimeFallback, replayed with a fake clock instead of
sleep())."""

from __future__ import annotations

from loongcollector_spark.limiter import ConcurrencyLimiter, RateLimiter


class Clock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t

    def sleep(self, s):
        self.t += s


def _rounds(lim, clock, n, success):
    for _ in range(n):
        lim.post_pop()
        (lim.on_success if success else lim.on_fail)(clock())
        lim.on_send_done()


def test_limiter_aimd_scenario():
    """TestLimiter (ConcurrencyLimiterUnittest.cpp:30-145): fast
    fallback 80->40, +1 on an all-success window, slow fallback x0.8 at
    20% fail, hold at 10% fail, floor at min, admission blocks at the
    window, interval-closed window."""
    clock = Clock()
    lim = ConcurrencyLimiter("", 80, 20, clock=clock)

    # fastFallBack: 10 failures -> one window at 100% fail -> 80*0.5
    assert lim.is_valid_to_pop()
    for _ in range(lim.statistic_threshold):
        lim.post_pop()
        assert lim.in_sending == 1
        lim.on_fail(clock())
        lim.on_send_done()
    assert lim.current_concurrency == 40
    assert lim.in_sending == 0

    # all-success window -> +1
    for _ in range(lim.statistic_threshold):
        assert lim.is_valid_to_pop()
        lim.post_pop()
    assert lim.in_sending == 10
    for _ in range(lim.statistic_threshold):
        lim.on_success(clock())
        lim.on_send_done()
    assert lim.in_sending == 0
    assert lim.current_concurrency == 41

    # slowFallBack: 8 success + 2 fail = 20% -> 41*0.8
    _rounds(lim, clock, lim.statistic_threshold - 2, True)
    _rounds(lim, clock, 2, False)
    assert lim.current_concurrency == int(41 * 0.8)

    # no fallback: 9 success + 1 fail = 10% -> hold
    _rounds(lim, clock, lim.statistic_threshold - 1, True)
    _rounds(lim, clock, 1, False)
    assert lim.current_concurrency == int(41 * 0.8)

    # all-fail windows floor at min_concurrency
    for _ in range(10):
        _rounds(lim, clock, lim.statistic_threshold, False)
    assert lim.current_concurrency == 20

    # admission blocks once in-flight reaches the window
    for _ in range(20):
        assert lim.is_valid_to_pop()
        lim.post_pop()
    assert not lim.is_valid_to_pop()
    for _ in range(20):
        lim.on_send_done()

    # interval-closed window: 7 success + 1 fail, then >3s idle, then 1
    # success closes the window by TIME at 1/9 fail = 11% -> slow x0.8
    lim.set_current_limit(40)
    _rounds(lim, clock, lim.statistic_threshold - 3, True)
    _rounds(lim, clock, 1, False)
    clock.sleep(4)
    _rounds(lim, clock, 1, True)
    assert lim.current_concurrency == int(40 * 0.8)


def test_time_fallback_scenario():
    """TestTimeFallback (:147-253): entering fallback at the floor,
    refusing until the backoff elapses, one probe + exponential backoff
    (3s -> 6s, capped), success exits immediately and resets to 3s."""
    clock = Clock()
    lim = ConcurrencyLimiter("tf", 80, 1, time_fallback_duration_ms=3000,
                             clock=clock)
    for _ in range(10):
        _rounds(lim, clock, lim.statistic_threshold, False)
    assert lim.current_concurrency == 1
    assert lim.in_time_fallback()

    assert not lim.is_valid_to_pop()
    clock.sleep(1)
    assert not lim.is_valid_to_pop()
    clock.sleep(1)
    assert not lim.is_valid_to_pop()
    clock.sleep(2)  # 4s elapsed >= 3s: one probe admitted
    assert lim.in_sending == 0
    assert lim.is_valid_to_pop()
    lim.post_pop()
    assert lim.in_time_fallback()
    lim.on_send_done()

    # next wait is 6s (backoff doubled)
    assert not lim.is_valid_to_pop()
    clock.sleep(3)
    assert not lim.is_valid_to_pop()
    clock.sleep(3)
    assert lim.is_valid_to_pop()

    # success exits fallback immediately and resets the backoff
    lim.post_pop()
    lim.on_success(clock())
    lim.on_send_done()
    assert not lim.in_time_fallback()
    assert lim.is_valid_to_pop()

    # re-entering starts from the initial 3s again, not 12s
    lim.set_current_limit(1)
    _rounds(lim, clock, lim.statistic_threshold, False)
    assert lim.in_time_fallback()
    clock.sleep(3)
    assert lim.is_valid_to_pop()


def test_no_time_fallback_when_disabled():
    """TestNoTimeFallback: duration 0 never enters fallback — at the
    floor the limiter keeps admitting up to min_concurrency."""
    clock = Clock()
    lim = ConcurrencyLimiter("", 80, 1, time_fallback_duration_ms=0,
                             clock=clock)
    for _ in range(10):
        _rounds(lim, clock, lim.statistic_threshold, False)
    assert lim.current_concurrency == 1
    assert not lim.in_time_fallback()
    assert lim.is_valid_to_pop()


def test_backoff_caps_at_max_duration():
    """TestExponentialBackoffWithMaxDuration: the doubled backoff never
    exceeds max_fallback_duration_ms."""
    clock = Clock()
    lim = ConcurrencyLimiter("", 8, 1, time_fallback_duration_ms=3000,
                             max_fallback_duration_ms=5000, clock=clock)
    for _ in range(6):
        _rounds(lim, clock, lim.statistic_threshold, False)
    assert lim.in_time_fallback()
    clock.sleep(3)
    assert lim.is_valid_to_pop()      # probe 1; backoff -> min(6000, 5000)
    clock.sleep(4.9)
    assert not lim.is_valid_to_pop()  # capped at 5s, not 6s yet... 4.9 < 5
    clock.sleep(0.2)
    assert lim.is_valid_to_pop()


def test_rate_limiter_per_second_budget():
    clock = Clock()
    rl = RateLimiter(1000, clock=clock)
    assert rl.is_valid_to_pop()
    rl.post_pop(600)
    assert rl.is_valid_to_pop()   # 600 <= 1000
    rl.post_pop(600)
    # 1200 > 1000: refused within the same second
    assert not rl.is_valid_to_pop()
    clock.sleep(1.0)
    assert rl.is_valid_to_pop()   # counter reset on the next wall second


def test_paced_send_adapts_to_flaky_destination():
    """paced_send narrows the window under failures (fast fallback),
    enters time fallback at the floor, probes through the backoff, and
    recovers (+1 per clean window) when the destination heals."""
    from loongcollector_spark.limiter import paced_send

    clock = Clock()
    lim = ConcurrencyLimiter("dest", 16, 1, time_fallback_duration_ms=1000,
                             clock=clock)
    state = {"healthy": False, "calls": 0}

    def send(req):
        state["calls"] += 1
        if state["calls"] > 40:
            state["healthy"] = True
        return state["healthy"]

    out = paced_send(range(80), send, lim, wait=lambda: clock.sleep(0.5))
    # destination failed for 40 calls then healed: the limiter hit the
    # floor and entered+exited time fallback, and later windows are
    # clean so the window re-opens
    assert not any(out[:40]) and all(out[40:])
    assert not lim.in_time_fallback()
    assert lim.current_concurrency > 1
