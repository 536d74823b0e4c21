"""Per-host politeness token bucket.

Re-expression of the reference's two rate limiters: the crawl4ai
``RateLimiter(base_delay=(0.5, 1.0), max_delay=10)`` inside
MemoryAdaptiveDispatcher (reference actions.py:251-257, config.yml:69-71)
and the Upstash ``TokenBucket(max_tokens=10, refill_rate=5, interval=10)``
(redisCache.py:85-89).

Runs on a *virtual clock* (milliseconds) supplied by the caller so the
crawl is deterministic and never sleeps: the frontier advances the
clock one round at a time, and a host yields at most
``round_ms / crawl_delay_ms`` URLs per round.
"""

from __future__ import annotations


class TokenBucket:
    __slots__ = ("capacity", "refill_per_ms", "tokens", "last_ms")

    def __init__(self, capacity: float, refill_per_ms: float, now_ms: int = 0):
        self.capacity = float(capacity)
        self.refill_per_ms = float(refill_per_ms)
        self.tokens = float(capacity)
        self.last_ms = int(now_ms)

    def _refill(self, now_ms: int) -> None:
        if now_ms > self.last_ms:
            self.tokens = min(self.capacity, self.tokens + (now_ms - self.last_ms) * self.refill_per_ms)
            self.last_ms = now_ms

    def try_take(self, now_ms: int, n: float = 1.0) -> bool:
        """Consume n tokens if available at virtual time now_ms."""
        self._refill(now_ms)
        if self.tokens + 1e-9 >= n:
            self.tokens -= n
            return True
        return False

    def available(self, now_ms: int) -> float:
        self._refill(now_ms)
        return self.tokens

    def state(self) -> tuple:
        return (self.capacity, self.refill_per_ms, self.tokens, self.last_ms)

    @classmethod
    def from_state(cls, s: tuple) -> "TokenBucket":
        obj = cls.__new__(cls)
        obj.capacity, obj.refill_per_ms, obj.tokens, obj.last_ms = s
        return obj
