"""Selector auto-detection (M8; reference dynamic_selectors.py:4-48).

The reference walks the DOM with BeautifulSoup building a CSS selector
(``tag.class#id[attr=v]``) and an XPath (ancestor chain) for every tag.
From-scratch equivalent on a dependency-free, stack-based tag scanner:
for each element we emit the same two selector shapes, deterministic in
document order.  (The reference's only call sites are commented out —
triggers.py:203-204 — so this is API-parity, not a hot path.)
"""

from __future__ import annotations

import re
from typing import Dict, List

_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9-]*)((?:\s+[^<>]*?)?)(/?)>")
_ATTR_RE = re.compile(r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*["']([^"']*)["']""")

_VOID = frozenset("area base br col embed hr img input link meta source track wbr".split())


def auto_detect_selectors(html: bytes | str, max_elements: int = 500) -> List[Dict[str, str]]:
    """→ [{tag, css, xpath}] per element, document order.

    css: ``tag#id.class1.class2`` (id wins; first attr as [k=v] when no
    id/class).  xpath: ``/html[1]/body[1]/div[2]/p[1]`` — positional
    ancestor chain.
    """
    s = html.decode("utf-8", "replace") if isinstance(html, (bytes, bytearray)) else html
    out: List[Dict[str, str]] = []
    # stack entries: (tag, xpath_component, child_counts dict)
    stack: List[tuple] = [("", "", {})]
    for m in _TAG_RE.finditer(s):
        closing, tag, attrs_raw, self_close = m.groups()
        tag = tag.lower()
        if closing:
            for k in range(len(stack) - 1, 0, -1):
                if stack[k][0] == tag:
                    del stack[k:]
                    break
            continue
        counts = stack[-1][2]
        counts[tag] = counts.get(tag, 0) + 1
        xpath = "".join(e[1] for e in stack) + f"/{tag}[{counts[tag]}]"
        attrs = dict(_ATTR_RE.findall(attrs_raw or ""))
        css = tag
        if "id" in attrs and attrs["id"]:
            css += f"#{attrs['id']}"
        elif "class" in attrs and attrs["class"]:
            css += "".join(f".{c}" for c in attrs["class"].split())
        elif attrs:
            k, v = next(iter(attrs.items()))
            css += f"[{k}={v}]"
        out.append({"tag": tag, "css": css, "xpath": xpath})
        if len(out) >= max_elements:
            break
        if not self_close and tag not in _VOID:
            stack.append((tag, f"/{tag}[{counts[tag]}]", {}))
    return out
