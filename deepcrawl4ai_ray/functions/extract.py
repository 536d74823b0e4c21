"""Deterministic HTML → text/markdown extraction + link discovery.

This is the engine's re-expression of the reference's extraction stage
(``DefaultMarkdownGenerator(content_filter=PruningContentFilter(
threshold=0.45, threshold_type="dynamic", min_word_threshold=5))`` —
reference crawl.py:337-346, triggers.py:174-183, api.py:212-227).  The
crawl4ai algorithm is a library dependency the reference never defines;
our from-scratch extractor fixes an equivalent, fully deterministic
spec (the per-row invariant: byte-identical ``text`` per ``url``):

  1. decode UTF-8 (errors="replace")
  2. remove comments and <script>/<style>/<noscript>/<template>/<svg>/
     <head> elements
  3. remove <nav>/<header>/<footer>/<aside> elements (the boilerplate-
     pruning analog of PruningContentFilter)
  4. <h1..6> blocks become markdown headings ('#'*level + ' ' + text),
     kept regardless of length
  5. <li> blocks become '- ' bullets
  6. remaining content is split into blocks on block-level tags
     (p, div, section, article, ul, ol, table, tr, br, blockquote, pre)
  7. inline tags are stripped, entities unescaped, whitespace collapsed
  8. non-heading, non-bullet blocks with fewer than 5 words are dropped
     (min_word_threshold=5, crawl.py:343)
  9. blocks are joined with '\\n\\n'

Pure functions only — safe to call from any map_batches worker.  The
corpus generator (sources/corpus.py) computes the oracle ``text`` column
with this same function at generation time (FIXTURES.md §1).
"""

from __future__ import annotations

import html as _htmllib
import re
from typing import List

from .urlnorm import host_of, normalize_url, resolve_link

MIN_WORDS = 5  # min_word_threshold analog (reference crawl.py:343)

# step 2+3: elements removed wholesale (non-greedy to the first close tag;
# the corpus never nests same-name drop elements)
_DROP_RE = re.compile(
    r"<!--.*?-->"
    r"|<(script|style|noscript|template|svg|head|nav|header|footer|aside)\b"
    r".*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
# step 4: headings → control-char sentinel blocks: \x04\x02<level> inner\x04
_HEADING_RE = re.compile(r"<h([1-6])\b[^>]*>(.*?)</h\1\s*>", re.IGNORECASE | re.DOTALL)
# step 5: list items → bullet sentinel
_LI_RE = re.compile(r"<li\b[^>]*>(.*?)</li\s*>", re.IGNORECASE | re.DOTALL)
# step 6: block-level separators
_BLOCK_RE = re.compile(
    r"\x04|</?(?:p|div|section|article|ul|ol|table|tr|blockquote|pre)\b[^>]*>"
    r"|<br\s*/?>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def _clean_inline(fragment: str) -> str:
    txt = _TAG_RE.sub(" ", fragment)
    if "&" in txt:  # unescape only when an entity can exist (hot-path cost)
        txt = _htmllib.unescape(txt)
    return _WS_RE.sub(" ", txt).strip()


def _blocks(html: bytes | str, prune: bool) -> List[str]:
    s = html.decode("utf-8", "replace") if isinstance(html, (bytes, bytearray)) else html
    # strip our sentinel control chars from the input (never legitimate
    # in HTML text; adversarial input must not corrupt block parsing)
    if "\x02" in s or "\x03" in s or "\x04" in s:
        s = s.replace("\x02", "").replace("\x03", "").replace("\x04", "")
    s = _DROP_RE.sub(" ", s)
    # backreference replacement strings: one C call, no per-match python
    s = _HEADING_RE.sub("\x04\x02\\1 \\2\x04", s)
    s = _LI_RE.sub("\x04\x03\\1\x04", s)
    out: List[str] = []
    for block in _BLOCK_RE.split(s):
        if not block or block.isspace():
            continue
        if block[0] == "\x02":  # heading: keep regardless of word count
            level = int(block[1])
            txt = _clean_inline(block[2:])
            if txt:
                out.append("#" * level + " " + txt)
        elif block[0] == "\x03":  # list item: bullet, keep regardless
            txt = _clean_inline(block[1:])
            if txt:
                out.append("- " + txt)
        else:
            txt = _clean_inline(block)
            # txt is single-space-collapsed: count(' ')+1 == word count
            if txt and (not prune or txt.count(" ") >= MIN_WORDS - 1):
                out.append(txt)
    return out


def extract_text(html: bytes | str, mode: str = "fit") -> str:
    """HTML → markdown-ish text.  Deterministic; see module doc.

    Modes mirror the reference's content-filter enum (utils.py:45-49,
    dispatch api.py:211-227): ``fit`` = pruned (PruningContentFilter
    analog, the default and the corpus-oracle spec); ``raw`` = no
    min-word pruning (DefaultMarkdownGenerator without filter).
    """
    return "\n\n".join(_blocks(html, prune=(mode == "fit")))


def extract_text_bm25(html: bytes | str, query: str, top_k: int = 5) -> str:
    """BM25 content filter (M6 analog of ``BM25ContentFilter(user_query)``).

    Blocks are scored with BM25 (k1=1.5, b=0.75; idf over the document's
    own blocks); the ``top_k`` highest-scoring blocks with score > 0 are
    kept **in document order**.  Fully deterministic.
    """
    import math

    blocks = _blocks(html, prune=True)
    if not blocks:
        return ""
    q_terms = [t for t in query.lower().split() if t]
    toks = [[w.lower() for w in b.split()] for b in blocks]
    n = len(blocks)
    avg_len = sum(len(t) for t in toks) / n
    df = {t: sum(1 for bt in toks if t in bt) for t in set(q_terms)}
    k1, b = 1.5, 0.75
    scores = []
    for i, bt in enumerate(toks):
        s = 0.0
        for t in q_terms:
            f = bt.count(t)
            if f == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * len(bt) / avg_len))
        scores.append((s, i))
    keep = sorted(i for s, i in sorted(scores, key=lambda x: (-x[0], x[1]))[:top_k] if s > 0)
    return "\n\n".join(blocks[i] for i in keep)


_HREF_RE = re.compile(r"""<a\s[^>]*?href\s*=\s*["']([^"'<>]+)["']""", re.IGNORECASE)
_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:")


def extract_links(
    html: bytes | str,
    base_url: str,
    *,
    exclude_external: bool = False,
) -> List[str]:
    """Discover ``<a href>`` links, resolved + normalized, document order,
    first-occurrence deduped.

    ``exclude_external`` mirrors the reference's link-scope filters
    (``exclude_external_links=True``, actions.py:246-247): drop links
    whose host differs from the page's host.  Non-http(s) schemes are
    always dropped.
    """
    s = html.decode("utf-8", "replace") if isinstance(html, (bytes, bytearray)) else html
    base_host = host_of(base_url)
    seen = set()
    out: List[str] = []
    for href in _HREF_RE.findall(s):
        href = href.strip()
        m = _SCHEME_RE.match(href)
        if m and m.group(0) not in ("http:", "https:"):
            continue  # mailto:, javascript:, data:, …
        u = normalize_url(resolve_link(base_url, href))
        if not u.startswith(("http://", "https://")):
            continue
        if exclude_external and host_of(u) != base_host:
            continue
        if u not in seen:
            seen.add(u)
            out.append(u)
    return out


def page_metadata_columns(html):
    """Per-page metadata columns (the reference's ``CrawlResult.metadata``
    and ``result.media`` counts, consumed at triggers.py:220-226): page
    title, first <h1>, and heading/link/paragraph/image tallies.

    Fully vectorized — every column is a pyarrow.compute RE2 kernel
    (``extract_regex`` / ``count_substring_regex``) over the raw html
    array, so the spec is engine-independent: a DuckDB ``regexp_extract``
    / ``regexp_extract_all`` oracle runs the *same* RE2 patterns and must
    agree bit-for-bit.  Accepts a binary or string Array/ChunkedArray;
    returns a dict of (title, h1: string; n_*: int64) arrays.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    s = html if pa.types.is_string(html.type) or pa.types.is_large_string(html.type) else pc.cast(html, pa.string())
    title = pc.struct_field(pc.extract_regex(s, r"(?s)<title[^>]*>(?P<v>.*?)</title>"), "v")
    h1 = pc.struct_field(pc.extract_regex(s, r"(?s)<h1[^>]*>(?P<v>.*?)</h1>"), "v")
    n = lambda pat: pc.cast(pc.count_substring_regex(s, pat), pa.int64())
    return {
        "title": pc.fill_null(title, ""),  # DuckDB regexp_extract → '' on no match
        "h1": pc.fill_null(h1, ""),
        "n_headings": n(r"<h[1-6][\s>]"),
        "n_links": n(r"<a[\s>]"),
        "n_paragraphs": n(r"<p[\s>]"),
        "n_images": n(r"<img[\s>]"),
    }
