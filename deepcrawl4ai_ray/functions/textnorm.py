"""Unicode NFC normalization — the canonicalization pass web-text
pipelines run before hashing/dedup so visually-identical strings
(combining sequences vs precomposed, compatibility codepoints like
U+212B) get one canonical byte form.  The reference emits extractor
output as-is (deepscrape tasks.py:381-383); this is a training-pipeline
extension with a DuckDB ``nfc_normalize`` oracle twin.

Vectorized shape: NFC is the identity on ASCII, so an Arrow-kernel
prescreen (``utf8_length == binary_length`` ⇔ pure-ASCII) passes the
overwhelming majority of web text through untouched and only the
non-ASCII minority pays the per-string ``unicodedata.normalize`` call.
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def nfc_normalize_batch(texts: pa.Array) -> tuple:
    """(normalized: StringArray, changed: BooleanArray).  ``changed`` is
    True iff normalization altered the string."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    if n == 0:
        return pa.array([], pa.string()), pa.array([], pa.bool_())
    # ASCII ⇔ one byte per codepoint: those rows are already NFC
    non_ascii = pc.not_equal(pc.utf8_length(texts), pc.binary_length(texts))
    mask = non_ascii.to_numpy(zero_copy_only=False)
    mask = np.where(np.isnan(mask.astype(float)), False, mask).astype(bool)
    if not mask.any():
        return texts, pa.array(np.zeros(n, dtype=bool))
    vals = np.asarray(texts.to_pylist(), dtype=object)
    changed = np.zeros(n, dtype=bool)
    for i in np.nonzero(mask)[0]:
        s = vals[i]
        if s is None:
            continue
        norm = unicodedata.normalize("NFC", s)
        if norm != s:
            vals[i] = norm
            changed[i] = True
    return pa.array(vals, pa.string()), pa.array(changed)
