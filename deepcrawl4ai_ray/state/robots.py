"""Per-host robots policy: disallow prefixes + crawl delay.

The reference delegates politeness to crawl4ai's RateLimiter and has no
robots.txt handling of its own; a from-scratch crawler needs one (north
rule).  The policy table is the ``robots`` parquet fixture
(FIXTURES.md §3); fetch actors cache parsed policies per host.
"""

from __future__ import annotations

from typing import Dict, List, Sequence
from urllib.parse import urlparse

DEFAULT_DELAY_MS = 1000


class RobotsPolicy:
    __slots__ = ("disallow", "crawl_delay_ms")

    def __init__(self, disallow: Sequence[str] = (), crawl_delay_ms: int = DEFAULT_DELAY_MS):
        self.disallow: List[str] = [d for d in disallow if d]
        self.crawl_delay_ms = int(crawl_delay_ms)

    def allows(self, url: str) -> bool:
        if not self.disallow:
            return True
        path = urlparse(url).path or "/"
        return not any(path.startswith(d) for d in self.disallow)


class RobotsCache:
    """host → RobotsPolicy lookup over the robots table (dict broadcast).

    At corpus scale the robots table is tiny relative to pages (one row
    per host) — it is broadcast once via ``ray.put`` and materialized as
    a dict inside each fetch actor's ``__init__`` (SURVEY.md §2.4 J2/J3
    broadcast-join pattern).
    """

    def __init__(self, table_rows: Dict[str, tuple]):
        # host -> (disallow_list, crawl_delay_ms)
        self._policies = {
            h: RobotsPolicy(dis, delay) for h, (dis, delay) in table_rows.items()
        }
        self._default = RobotsPolicy()

    def get(self, host: str) -> RobotsPolicy:
        return self._policies.get(host, self._default)

    @classmethod
    def from_arrow(cls, tbl) -> "RobotsCache":
        rows = {}
        hosts = tbl.column("host").to_pylist()
        dis = tbl.column("disallow").to_pylist()
        delay = tbl.column("crawl_delay_ms").to_pylist()
        for h, d, ms in zip(hosts, dis, delay):
            # None → default, but an EXPLICIT crawl_delay_ms=0 is honored
            # (``ms or DEFAULT`` coerced 0 → 1000, diverging from the SQL
            # oracle's COALESCE — r4 advice)
            rows[h] = (d or [], ms if ms is not None else DEFAULT_DELAY_MS)
        return cls(rows)
