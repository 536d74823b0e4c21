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
    txt = _htmllib.unescape(txt)
    return _WS_RE.sub(" ", txt).strip()


def extract_text(html: bytes | str) -> str:
    """HTML → pruned markdown-ish text.  Deterministic; see module doc."""
    s = html.decode("utf-8", "replace") if isinstance(html, (bytes, bytearray)) else html
    s = _DROP_RE.sub(" ", s)
    s = _HEADING_RE.sub(lambda m: f"\x04\x02{m.group(1)} {m.group(2)}\x04", s)
    s = _LI_RE.sub(lambda m: f"\x04\x03{m.group(1)}\x04", s)
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
            if txt and len(txt.split(" ")) >= MIN_WORDS:
                out.append(txt)
    return "\n\n".join(out)


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
