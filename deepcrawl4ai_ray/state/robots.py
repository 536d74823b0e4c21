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


def parse_robots_txt(
    text: str | bytes, user_agent: str = "deepcrawl4ai-ray"
) -> RobotsPolicy:
    """Parse REAL ``robots.txt`` text → :class:`RobotsPolicy` — the
    Robots Exclusion Protocol per RFC 9309 §2, from scratch (the parquet
    robots table is the fixture form; a live crawler receives bytes):

    * records are ``field: value`` lines; ``#`` starts a comment;
      unknown fields are ignored (§2.2.4)
    * ``User-agent`` lines open a GROUP; consecutive UA lines share the
      following rules; matching is case-insensitive substring-of-token
      with ``*`` as the wildcard group (§2.2.1)
    * the MOST SPECIFIC matching group wins (longest UA token match,
      ``*`` = specificity 0); only that group's rules apply
    * ``Disallow:`` with an empty value means allow-all (no prefix)
    * ``Crawl-delay`` (the de-facto extension) is read in SECONDS
      (fractions allowed) → ``crawl_delay_ms``

    Returns the permissive default policy for empty/unparseable input —
    RFC 9309 §2.3.1.3: an unavailable robots.txt means crawl-all (this
    parser never raises; a 5xx-fetch policy decision belongs to the
    caller).
    """
    if isinstance(text, (bytes, bytearray)):
        text = text.decode("utf-8", "replace")
    ua = user_agent.lower()

    groups: list[tuple[list[str], list[str], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[str] = []
    cur_delay: float | None = None
    in_group_rules = False

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay, in_group_rules
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None
        in_group_rules = False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_rules:  # a UA line after rules starts a NEW group
                flush()
            cur_agents.append(value.lower())
        elif field == "disallow":
            in_group_rules = True
            if value:
                cur_rules.append(value)
        elif field == "crawl-delay":
            in_group_rules = True
            try:
                cur_delay = float(value)
            except ValueError:
                pass  # malformed extension value: ignore (§2.2.4)
        elif field in ("allow", "sitemap"):
            in_group_rules = field == "allow"  # known fields; rules unused here
    flush()

    best: tuple[int, list[str], float | None] | None = None
    for agents, rules, delay in groups:
        for a in agents:
            if a == "*":
                spec = 0
            elif a and a in ua:
                spec = len(a)
            else:
                continue
            if best is None or spec > best[0]:
                best = (spec, rules, delay)
    if best is None:
        return RobotsPolicy()
    _, rules, delay = best
    # round, don't truncate: 0.333 s parses as 332.999…94 in binary
    delay_ms = DEFAULT_DELAY_MS if delay is None else int(round(delay * 1000))
    return RobotsPolicy(rules, delay_ms)


def render_robots_txt(policy: RobotsPolicy) -> str:
    """RobotsPolicy → canonical ``robots.txt`` text (the writer half of
    the round-trip; Crawl-delay emitted in seconds)."""
    lines = ["User-agent: *"]
    for d in policy.disallow:
        lines.append(f"Disallow: {d}")
    if not policy.disallow:
        lines.append("Disallow:")
    lines.append(f"Crawl-delay: {policy.crawl_delay_ms / 1000:g}")
    return "\n".join(lines) + "\n"


def robots_table_from_texts(hosts: Sequence[str], texts: Sequence[str], user_agent: str = "deepcrawl4ai-ray"):
    """(host, robots.txt bytes) pairs → the engine's robots Arrow table
    (host, disallow list<string>, crawl_delay_ms) — the ingestion bridge
    from live robots.txt responses to RobotsCache.from_arrow."""
    import pyarrow as pa

    dis, delays = [], []
    for t in texts:
        p = parse_robots_txt(t, user_agent)
        dis.append(p.disallow)
        delays.append(p.crawl_delay_ms)
    return pa.table(
        {
            "host": pa.array(list(hosts), pa.string()),
            "disallow": pa.array(dis, pa.list_(pa.string())),
            "crawl_delay_ms": pa.array(delays, pa.int64()),
        }
    )
