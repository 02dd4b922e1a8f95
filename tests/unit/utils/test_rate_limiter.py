import asyncio, time
import pytest
from prime_rl_tpu.utils.async_utils import RateLimiter

def test_rate_limiter_throttles():
    async def go():
        rl = RateLimiter(rate=5, period=0.5)
        t0 = time.monotonic()
        for _ in range(11):
            await rl.acquire()
        return time.monotonic() - t0
    took = asyncio.run(go())
    assert took >= 0.9, took  # 11 starts at 5/0.5s needs >= 2 windows

def test_rate_limiter_disabled_is_free():
    async def go():
        rl = RateLimiter(rate=0)
        t0 = time.monotonic()
        for _ in range(1000):
            await rl.acquire()
        return time.monotonic() - t0
    assert asyncio.run(go()) < 0.5
