"""CDX-style SURT-sorted URL index — the web-archive lookup structure
(Common Crawl / Wayback CDXJ convention): every captured URL keyed by
its SURT form (reversed host labels + ")" + path), globally sorted, so
that all captures of one host — or one host's path subtree — are a
contiguous key range.  The reference keeps per-task Redis hashes for
URL lookup (SURVEY §2 K1, api.py:400-406); at corpus scale the
archive-standard answer is this sorted index.

Build/query split (same discipline as stages/textindex and knn's IVF):

- BUILD: one pass adds the surt key (vectorized string ops), a global
  ``ds.sort("surt")`` range-partitions the corpus (the one wide step,
  amortized over every later lookup), files are written sorted, and a
  tiny MANIFEST of per-file [min, max] surt ranges is derived from the
  parquet footers — metadata only, no data re-read.
- QUERY: a prefix lookup consults the manifest (KB-sized, driver-side
  by design) and reads ONLY the files whose range intersects the
  prefix interval, with the exact ``starts_with`` filter applied
  per batch.  Lookup cost is O(result + one file) independent of
  corpus size.
"""

from __future__ import annotations

import glob
import os
from typing import List

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data


def surt_key(url: str) -> str:
    """URL → SURT key: ``scheme://a.b.c/path`` → ``c,b,a)/path``.
    The ")" terminator keeps host prefixes exact: ``example,host-7)``
    never matches ``example,host-70)...``.  Scheme is dropped (archive
    convention: http/https collapse)."""
    _, sep, rest = url.partition("://")
    if not sep:
        rest = url
    host, slash, path = rest.partition("/")
    # archive SURT convention lowercases the host (DNS is case-insensitive)
    # so a capture of https://Host.Example and a lowercase prefix lookup
    # land on the same key; the path stays case-sensitive.
    rev = ",".join(reversed(host.lower().split(".")))
    return rev + ")" + (("/" + path) if slash else "")


def surt_prefix_for_host(host: str) -> str:
    """The SURT prefix covering every URL of ``host`` (exact-host
    match, subdomains excluded — they sort under a longer prefix)."""
    return ",".join(reversed(host.lower().split("."))) + ")"


def make_surt_fn(url_col: str = "url"):
    def fn(batch: pa.Table) -> pa.Table:
        surts = [surt_key(u) for u in batch[url_col].to_pylist()]
        return batch.append_column("surt", pa.array(surts, pa.string()))

    return fn


def build_cdx_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    url_col: str = "url",
    keep_cols: List[str] | None = None,
) -> str:
    """Sort the (slim) capture table by surt and persist it with a
    per-file range manifest.  Pass only the lookup columns in
    ``keep_cols`` (url + timestamps/digests) — never page payloads."""
    cols = keep_cols or [url_col]
    in_schema = ds.schema()  # captured up front: an empty ds reports None post-execution
    slim = ds.select_columns(cols).map_batches(make_surt_fn(url_col), batch_format="pyarrow")
    out = os.path.join(index_dir, "captures")
    slim.sort("surt").write_parquet(out)

    files = sorted(glob.glob(os.path.join(out, "*.parquet")))
    lo: List[str] = []
    hi: List[str] = []
    keep: List[str] = []
    for f in files:
        # range from the actual key column, NOT parquet row-group
        # statistics: parquet truncates/empties string stats above
        # max_statistics_size (4 KB default), so a file containing one
        # long SURT would record hi="" and silently vanish from every
        # lookup.  One pruned single-column read per file at build time.
        surts = pq.read_table(f, columns=["surt"])["surt"]
        if len(surts) == 0:
            continue
        mm = pc.min_max(surts)
        keep.append(f)
        lo.append(mm["min"].as_py())
        hi.append(mm["max"].as_py())
    pq.write_table(
        pa.table(
            {
                "file": pa.array(keep, pa.string()),
                "lo": pa.array(lo, pa.string()),
                "hi": pa.array(hi, pa.string()),
            }
        ),
        os.path.join(index_dir, "manifest.parquet"),
    )
    # empty-index lookups need a schema even when no capture file exists
    from .join import _arrow_type

    types = {n: _arrow_type(t) for n, t in zip(in_schema.names, in_schema.types)}
    arrow_schema = pa.schema(
        [(c, types[c]) for c in cols] + [("surt", pa.string())]
    )
    pq.write_table(arrow_schema.empty_table(), os.path.join(index_dir, "_schema.parquet"))
    return index_dir


def cdx_prefix_lookup(index_dir: str, prefix: str) -> "ray.data.Dataset":
    """All captures whose surt starts with ``prefix`` → Dataset, read
    from only the manifest-intersecting files.  The exclusive upper
    bound is prefix with its last codepoint incremented (standard
    prefix-interval trick)."""
    if not prefix:
        raise ValueError("empty prefix would scan the whole index")
    upper = prefix[:-1] + chr(ord(prefix[-1]) + 1)
    man = pq.read_table(os.path.join(index_dir, "manifest.parquet"))
    files = [
        f
        for f, lo, hi in zip(
            man["file"].to_pylist(), man["lo"].to_pylist(), man["hi"].to_pylist()
        )
        if lo < upper and hi >= prefix
    ]
    import ray.data as rd

    if not files:
        schema = pq.read_table(os.path.join(index_dir, "_schema.parquet")).schema
        return rd.from_arrow(schema.empty_table())
    return rd.read_parquet(files).map_batches(
        lambda t: t.filter(pc.starts_with(t["surt"], pattern=prefix)),
        batch_format="pyarrow",
    )


def cdx_files_for_prefix(index_dir: str, prefix: str) -> tuple:
    """(files that a prefix lookup reads, total files) — the pruning
    evidence hook used by tests and bench."""
    upper = prefix[:-1] + chr(ord(prefix[-1]) + 1)
    man = pq.read_table(os.path.join(index_dir, "manifest.parquet"))
    total = man.num_rows
    n = sum(
        1
        for lo, hi in zip(man["lo"].to_pylist(), man["hi"].to_pylist())
        if lo < upper and hi >= prefix
    )
    return n, total
