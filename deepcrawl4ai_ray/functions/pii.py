"""PII redaction — vectorized regex scrubbing of emails / IPv4
addresses / phone numbers from a text column, a standard
training-data-pipeline hygiene pass the reference does not have (its
text path stops at markdown extraction, tasks.py / utils.py).

Everything runs through Arrow's RE2 kernels
(``pc.count_substring_regex`` / ``pc.replace_substring_regex``) — zero
Python-level row loops — and the patterns are RE2-compatible, so a
DuckDB oracle (``regexp_matches`` / ``regexp_replace(..., 'g')``, also
RE2) reproduces counts and redacted text byte-for-byte.  RE2 ``\\w`` /
``\\b`` are ASCII; identical on both sides.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Order matters: email first (its local part may contain digit runs a
# later pattern could otherwise nibble), then IP (dotted digit runs),
# then phone.  Each (name, pattern, replacement) is part of the spec.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def redact_batch(texts: pa.Array) -> tuple[pa.Array, dict[str, pa.Array]]:
    """(redacted texts, {kind: per-row match count}) — counts are taken
    on the ORIGINAL text (before any replacement), then the three
    replacements are applied in PII_PATTERNS order."""
    counts = {
        name: pc.count_substring_regex(texts, pat) for name, pat, _ in PII_PATTERNS
    }
    out = texts
    for _, pat, repl in PII_PATTERNS:
        out = pc.replace_substring_regex(out, pat, repl)
    return out, counts


def redact_table(
    batch: pa.Table, text_col: str, out_col: str | None = None
) -> pa.Table:
    """Map-batches shape: adds ``n_email``/``n_ip``/``n_phone`` and
    replaces (or adds) the redacted text column."""
    red, counts = redact_batch(batch[text_col])
    t = batch
    for name in ("email", "ip", "phone"):
        t = t.append_column(f"n_{name}", counts[name].cast(pa.int64()))
    tgt = out_col or text_col
    if tgt in t.column_names:
        t = t.set_column(t.column_names.index(tgt), tgt, red)
    else:
        t = t.append_column(tgt, red)
    return t
