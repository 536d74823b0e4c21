"""URL normalization / slug / host helpers.

Pure, deterministic functions.  Semantics derived from the reference:
- scheme prefixing + percent-decode: tasks.py:343, api.py:210, api.py:730-733
- url → unique slug: utils.py:176-180 (urlparse + ``[^a-zA-Z0-9_-] -> "-"``)
Host hashing (the crawl partition key) is our own addition — the
reference never partitions by host.
"""

from __future__ import annotations

import re
from urllib.parse import unquote, urljoin, urlparse

import numpy as np
import pandas as pd

_SLUG_RE = re.compile(r"[^a-zA-Z0-9_-]")


def normalize_url(url: str) -> str:
    """Scheme-normalize + percent-decode, mirroring the reference.

    ``https://`` is prefixed when no scheme is present (tasks.py:343);
    percent-encoding is decoded (api.py:210); the fragment is dropped
    (fragments never reach a server, so a fragment-only difference must
    not create a distinct frontier entry); a bare trailing slash on an
    empty path is removed so ``https://h`` and ``https://h/`` are one URL.
    """
    u = unquote(url.strip())
    # drop fragment (after decode — an encoded %23 is treated as a
    # delimiter, matching the reference's unquote-then-use order,
    # api.py:210)
    h = u.find("#")
    if h != -1:
        u = u[:h].rstrip()
    if not u:
        return u
    if "://" not in u:
        u = "https://" + u
    scheme, sep, rest = u.partition("://")
    if rest.endswith("/") and rest.count("/") == 1:
        # exactly "scheme://host/" → strip the root slash
        rest = rest[:-1]
    # final trim: root-slash removal can expose trailing whitespace that
    # the entry strip() would eat on a SECOND pass (e.g. "0\r/" →
    # "https://0\r") — idempotency requires stripping it now
    # (property-tested)
    return (scheme.lower() + sep + rest).strip()


def canonical_url_key(urls) -> "pa.Array":
    """Canonical grouping key for URL-variant dedup — the candidate key
    under which http/https, www/apex, query-string and trailing-slash
    variants of one logical page collide: strip scheme, strip a leading
    ``www.``, drop the whole query string, strip trailing slashes,
    lowercase.  All Arrow RE2 kernels (zero row loops); DuckDB's
    regexp_replace is the same RE2 engine, so the SQL twin reproduces
    the key byte-for-byte."""
    import pyarrow as pa
    import pyarrow.compute as pc

    k = pc.replace_substring_regex(urls, pattern="^https?://", replacement="")
    k = pc.replace_substring_regex(k, pattern=r"^www\.", replacement="")
    k = pc.replace_substring_regex(k, pattern=r"\?.*$", replacement="")
    k = pc.replace_substring_regex(k, pattern="/+$", replacement="")
    return pc.utf8_lower(k)


def url_to_slug(url: str) -> str:
    """URL → filesystem-safe unique name (semantics of utils.py:176-180)."""
    p = urlparse(url)
    base = (p.netloc + p.path).strip("/")
    return _SLUG_RE.sub("-", base) or "root"


def host_of(url: str) -> str:
    """netloc of an absolute URL ('' when unparseable)."""
    return urlparse(url).netloc


def resolve_link(base_url: str, href: str) -> str:
    """Resolve an href against its page URL (used by link discovery)."""
    return urljoin(base_url, href)


# ---------------------------------------------------------------------------
# Vectorized variants (used inside map_batches stages)
# ---------------------------------------------------------------------------

def hash64(values) -> np.ndarray:
    """Deterministic 64-bit hash of a string array (vectorized).

    Uses pandas' SipHash-based ``hash_array`` with fixed keys —
    deterministic across processes/hosts (unlike builtin ``hash``), which
    is required so that host→shard routing is identical on every worker.
    """
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False).astype(np.uint64)


def hosts_of(urls) -> np.ndarray:
    """Vectorized host extraction for ``https?://host/...`` URLs.

    Falls back to :func:`host_of` for anything unusual.
    """
    out = np.empty(len(urls), dtype=object)
    for i, u in enumerate(urls):
        j = u.find("://")
        if j == -1:
            out[i] = host_of(u)
            continue
        k = u.find("/", j + 3)
        out[i] = u[j + 3 :] if k == -1 else u[j + 3 : k]
    return out


def host_buckets(hosts, num_buckets: int) -> np.ndarray:
    """hash(host) % num_buckets — the crawl partition key (SURVEY.md §7)."""
    return (hash64(hosts) % np.uint64(num_buckets)).astype(np.int32)
