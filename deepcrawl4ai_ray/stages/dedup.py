"""Deduplication family — exact, MinHash+LSH, SimHash, embedding cosine.

First-class training-data-pipeline operators (beyond the reference,
whose only dedups are exact stream-message keys, job.py:471-484 J5, and
config-identity, crawler_pool.py:21-32 J6).  All are expressed as Ray
Data pipelines and RETURN Datasets — the pair/label sets never touch
the driver (write them to parquet or aggregate downstream; convert to
pandas only in oracle harnesses):

- exact:   vectorized content-hash per batch → hash-partitioned
           groupby(hash) → per-group first (min doc_id) — one shuffle
           of (hash, id) pairs only, never the payloads.
- minhash: shingle → minhash signature per batch → explode to
           (band_key, doc_id) rows → groupby(band_key) buckets →
           candidate pairs ID-ONLY → keyed join of shingle sets back
           onto the deduped candidates → exact-Jaccard verify.
- simhash: 64-bit signature per batch; near-dup = small Hamming
           distance within band buckets.
- embedding: SRP-LSH (random-hyperplane sign bands) → bucket groupby
           over fp16-quantized vectors (4× the shuffle density of
           float64) → margin-widened candidate screen → exact float64
           re-check of survivors via keyed joins — candidates bounded
           by band agreement, no driver-side matrix, no O(n²) sweep.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ..functions import hashing as H
from .join import shuffle_coalesce as _sc


def add_md5_column(id_col: str, text_col: str, out_col: str = "text_hash"):
    """map_batches fn: md5 content hash (matches DuckDB md5())."""

    def fn(batch: pa.Table) -> pa.Table:
        hashes = H.md5_hex_many(batch[text_col].to_pylist())
        return batch.append_column(out_col, pa.array(hashes, pa.string()))

    return fn


def exact_dedup_stats(ds: "ray.data.Dataset", id_col: str, text_col: str, num_buckets: int = 64):
    """→ Dataset(text_hash, keep_<id> = min id, n_copies) — one row per
    distinct content; the J5 'first-wins' generalization.  Same
    two-level shape as :func:`exact_dedup_losers` — a per-distinct-hash
    groupby aggregate carries state for every distinct doc at corpus
    scale."""
    slim = ds.map_batches(add_md5_column(id_col, text_col), batch_format="pyarrow").select_columns(
        ["text_hash", id_col]
    )

    def add_pb(t: pa.Table) -> pa.Table:
        hb = np.frombuffer(
            b"".join(bytes.fromhex(h[:8]) for h in t["text_hash"].to_pylist()), dtype=np.uint32
        )
        return t.append_column("pb", pa.array((hb % num_buckets).astype(np.int32)))

    keep_col = f"keep_{id_col}"

    def stats_group(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.groupby("text_hash", as_index=False).agg(
            **{keep_col: (id_col, "min"), "n_copies": (id_col, "size")}
        )
        return pa.Table.from_pandas(
            out,
            schema=pa.schema(
                [
                    ("text_hash", pa.string()),
                    (keep_col, t.schema.field(id_col).type),
                    ("n_copies", pa.int64()),
                ]
            ),
            preserve_index=False,
        )

    slimc = _sc(slim.map_batches(add_pb, batch_format="pyarrow"))
    out = slimc.groupby("pb").map_groups(stats_group, batch_format="pyarrow")
    from .join import _schema_types, _seed_empty

    tmap = _schema_types(slimc, slim, ds)
    if tmap is None:
        return out
    return _seed_empty(
        out,
        [("text_hash", pa.string()), (keep_col, tmap[id_col]), ("n_copies", pa.int64())],
    )


def canonical_url_dedup(
    ds: "ray.data.Dataset", url_col: str = "url"
) -> "ray.data.Dataset":
    """URL-variant dedup — collapse http/https, www/apex, query-string
    and trailing-slash variants of one logical page to a single
    preferred URL (the frontier-hygiene step upstream of content
    fetch: crawling both ``http://www.h/p?utm=x`` and ``https://h/p``
    wastes a fetch and later a content-dedup).  Grouping key =
    functions/urlnorm.canonical_url_key; the winner per key is the
    deterministic argmin of (https-first, shortest, lexicographic).

    Scale shape: keys are computed map-side with Arrow RE2 kernels; the
    groupby shuffles slim (key, pref, len, url) rows, BUCKETED by key
    hash so one vectorized pandas pass handles thousands of key-groups
    per task (per-key map_groups measured 17k urls/s at the sf1 proof —
    a Python call per page; this shape is ~20×) and fed through
    shuffle_coalesce so sub-inline-threshold chunks don't accumulate in
    the driver store.  → Dataset(canon_key, best_url, n_variants)."""
    from ..functions.urlnorm import canonical_url_key

    def keyed(batch: pa.Table) -> pa.Table:
        urls = batch[url_col]
        keys = canonical_url_key(urls)
        h = pd.util.hash_array(
            np.asarray(keys.to_pylist(), dtype=object), categorize=False
        )
        return pa.table(
            {
                "canon_key": keys,
                "pref": pc.cast(
                    pc.invert(pc.starts_with(urls, "https://")), pa.int32()
                ),
                "len": pc.cast(pc.utf8_length(urls), pa.int64()),
                url_col: urls,
                "__kb": pa.array((h % np.uint64(64)).astype(np.int32)),
            }
        )

    def pick_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["canon_key", "pref", "len", url_col], kind="mergesort"
        )
        g = df.groupby("canon_key", sort=False)
        out = g.head(1)[["canon_key", url_col]].rename(columns={url_col: "best_url"})
        out["n_variants"] = g[url_col].nunique().to_numpy()
        return pa.Table.from_pandas(
            out,
            schema=pa.schema(
                [
                    ("canon_key", pa.string()),
                    ("best_url", pa.string()),
                    ("n_variants", pa.int64()),
                ]
            ),
            preserve_index=False,
        )

    from .join import _seed_empty

    slim = _sc(ds.map_batches(keyed, batch_format="pyarrow"))
    return _seed_empty(
        slim.groupby("__kb").map_groups(pick_bucket, batch_format="pyarrow"),
        [("canon_key", pa.string()), ("best_url", pa.string()), ("n_variants", pa.int64())],
    )


def exact_dedup_losers(ds: "ray.data.Dataset", id_col: str, text_col: str, num_buckets: int = 64):
    """→ Dataset(<id>) of the rows exact dedup DROPS (everything except
    the min-id winner per content md5).  Only the slim (id, text_hash)
    pair ever shuffles — payload filtering is the caller's job (the
    bloom anti-join in the flagship pipeline keeps payload map-side).
    Two-level shape: hash-bucket text_hash into ``num_buckets`` groups,
    one vectorized min-transform per group (a per-distinct-hash groupby
    carries aggregate state for every distinct doc at corpus scale)."""
    slim = ds.map_batches(add_md5_column(id_col, text_col), batch_format="pyarrow").select_columns(
        ["text_hash", id_col]
    )

    def add_pb(t: pa.Table) -> pa.Table:
        hb = np.frombuffer(
            b"".join(bytes.fromhex(h[:8]) for h in t["text_hash"].to_pylist()), dtype=np.uint32
        )
        return t.append_column("pb", pa.array((hb % num_buckets).astype(np.int32)))

    def losers_group(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        keep = df.groupby("text_hash")[id_col].transform("min")
        out = df.loc[df[id_col] != keep, [id_col]]
        # pin the schema (from the input block, so empty groups don't
        # emit column-less blocks)
        return pa.Table.from_pandas(
            out,
            schema=pa.schema([(id_col, t.schema.field(id_col).type)]),
            preserve_index=False,
        )

    slimc = _sc(slim.map_batches(add_pb, batch_format="pyarrow"))
    out = slimc.groupby("pb").map_groups(losers_group, batch_format="pyarrow")
    from .join import _schema_types, _seed_empty

    tmap = _schema_types(slimc, slim, ds)
    if tmap is None:
        return out
    return _seed_empty(out, [(id_col, tmap[id_col])])


# ---------------------------------------------------------------------------
# Shared pair-plumbing: cross-band dedup + payload join-back.
# ---------------------------------------------------------------------------


def _dedup_pairs(
    pairs: "ray.data.Dataset",
    schema: pa.Schema,
    val_col: str | None,
    small_guard: int | None = None,
):
    """Cross-band pair dedup → unique (id_a, id_b[, val]).

    Scale path: one distributed groupby(id_a, id_b) — the pair set never
    touches the driver.  ``schema`` seeds an empty typed block so
    downstream stages always see a schema even when no candidate
    survived.  With ``val_col`` the (identical-across-bands) value is
    carried through via Min.

    ``small_guard``: guarded small-candidates fast path (same philosophy
    as the _join_payload broadcast guard) — when the RAW candidate count
    is ≤ guard, the (id_a, id_b[, val]) rows are ~17 B each, so the whole
    set is collected once and deduped driver-side with pandas instead of
    paying a full sort-shuffle whose fixed launch cost dominates at small
    candidate counts (measured 2.6 s → 0.1 s on the sf0.1 bench corpus,
    the r3-verdict minhash adjudication).  Above the guard the
    distributed groupby runs unchanged; byte-identical either way
    (mode-equality test in tests/test_stages.py)."""
    import ray.data as rd

    if small_guard is not None:
        pairs = pairs.materialize()
        if pairs.count() <= small_guard:
            df = pairs.to_pandas()
            if "id_a" not in df.columns:  # all-empty blocks dropped by Ray
                df = schema.empty_table().to_pandas()
            if val_col is None:
                df = df.drop_duplicates(["id_a", "id_b"])
            else:
                df = df.groupby(["id_a", "id_b"], as_index=False)[val_col].min()
            df = df.sort_values(["id_a", "id_b"]).reset_index(drop=True)
            return rd.from_arrow(pa.Table.from_pandas(df, schema=schema, preserve_index=False))

    # two-level distributed dedup: hash-bucket the pair into 64 groups,
    # then ONE pandas dedup per group — a groupby on the raw (id_a,
    # id_b) key would carry per-group aggregate state for every distinct
    # pair (millions of groups at corpus scale; measured ~10 s/1M pairs
    # vs ~1.5 s for this shape on the sf1 proof corpus)
    mult = np.uint64(0x9E3779B97F4A7C15)

    def add_pb(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pb = (((a * mult) ^ b) % np.uint64(64)).astype(np.int32)
        return t.append_column("pb", pa.array(pb))

    def dedup_group(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if val_col is None:
            df = df.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]]
        else:
            df = df.groupby(["id_a", "id_b"], as_index=False)[val_col].min()
        return pa.Table.from_pandas(df, schema=schema, preserve_index=False)

    from .join import shuffle_coalesce

    seeded = pairs.union(rd.from_arrow(schema.empty_table()))
    slim = shuffle_coalesce(seeded.map_batches(add_pb, batch_format="pyarrow"))
    return slim.groupby("pb").map_groups(dedup_group, batch_format="pyarrow")


#: auto mode broadcasts when the deduped pair set is at most this many
#: pairs (≈2× as many endpoint payloads through ray.put); above it, the
#: bloom-pruned join path runs.  2e5 pairs × ~1 KB payloads ≈ 400 MB of
#: object store — comfortably broadcastable on one node, far below what
#: two extra all-to-all joins would move.
_BROADCAST_MAX_PAIRS = 200_000

#: auto mode additionally bounds the broadcast by the MEASURED bytes of
#: the endpoint-filtered payload rows (pair COUNT alone under-estimates
#: fat payloads — shingle sets of long docs can be 100s of KB/row, so
#: 2×200k rows could be tens of GB through the driver).  The filtered
#: payload is materialized in the object store first; if it exceeds this
#: budget auto falls back to the prune path.
_BROADCAST_MAX_PAYLOAD_BYTES = 512 * 2**20


def _broadcast_payload(
    pairs: "ray.data.Dataset",
    payload: "ray.data.Dataset",
    id_col: str,
    pay_col: str,
    byte_budget: int | None = None,
    payload_stage=None,
    pay_type: "pa.DataType | None" = None,
) -> "ray.data.Dataset | None":
    """Small-pairs fast path: the candidate endpoint set is collected
    (bounded by the caller's auto guard), the payload table is filtered
    to those ids in one scan, and the surviving payload rows are
    broadcast once via ``ray.put`` — verify then runs map-side with NO
    join shuffle at all.  Eliminates the two bucketed-join sorts whose
    fixed all-to-all launch cost dominates when candidates are rare
    (the common case for near-dup detection: measured 2×+ on the bench
    corpus).  Byte-identical to the join paths (tested), including the
    inner-join semantics for pair endpoints ABSENT from the payload
    table (such pairs are dropped, not crashed on).  Like the join
    paths, ids are int-keyed (pair ids are int64 by construction of
    _dedup_pairs).

    ``payload_stage``: optional map_batches fn computing the payload
    column FROM the raw rows — when given, ``payload`` is the raw
    dataset and the endpoint filter runs BEFORE the payload compute, so
    shingle sets / normalized vectors are built only for candidate docs
    (a ~N/candidates compute cut; at 197k docs with ~0 candidates the
    whole second corpus pass collapses to the id filter)."""
    import ray as _ray

    from .join import cached_get

    pairs = pairs.materialize()
    ends: set = set()
    for b in pairs.select_columns(["id_a", "id_b"]).iter_batches(batch_format="pyarrow"):
        ends.update(b["id_a"].to_pylist())
        ends.update(b["id_b"].to_pylist())
    # ship the candidate id set via the object store, not the task
    # closure (at the 2e5-pair guard it is ~MBs pickled per task
    # submission otherwise)
    ids_ref = _ray.put(pa.array(sorted(int(x) for x in ends), pa.int64()))

    def keep(t: pa.Table) -> pa.Table:
        idset = cached_get(ids_ref, "dedup.payload_ids")
        return t.filter(pc.is_in(pc.cast(t[id_col], pa.int64()), value_set=idset))

    filtered = payload.map_batches(keep, batch_format="pyarrow")
    if payload_stage is not None:
        filtered = filtered.map_batches(payload_stage, batch_format="pyarrow")
    filtered = filtered.materialize()
    if pay_type is None:
        # zero-candidate runs can drop empty blocks (and their schema);
        # callers using payload_stage pass the type explicitly
        from .join import _schema_types

        tmap = _schema_types(filtered, payload)
        # type only matters for non-empty attach columns; with zero
        # candidates any placeholder type is fine
        pay_type = tmap.get(pay_col) if tmap else pa.null()
    if byte_budget is not None and (filtered.size_bytes() or 0) > byte_budget:
        # fat payloads: the broadcast LUT would stream this through the
        # driver — signal the caller to fall back to the prune join.
        return None
    rows = filtered.to_pandas()
    # zero-candidate runs can yield a column-less empty frame
    lut = dict(zip((int(x) for x in rows[id_col]), rows[pay_col])) if id_col in rows.columns else {}
    lut_ref = _ray.put(lut)

    def attach(t: pa.Table) -> pa.Table:
        lut = cached_get(lut_ref, "dedup.paylut")
        ia = t["id_a"].to_pylist()
        ib = t["id_b"].to_pylist()
        # inner-join semantics: a pair whose endpoint has no payload row
        # (e.g. a zero-shingle doc) is dropped, as the join paths do
        have = pa.array([int(a) in lut and int(b) in lut for a, b in zip(ia, ib)])
        t = t.filter(have)
        ia = t["id_a"].to_pylist()
        ib = t["id_b"].to_pylist()
        return t.append_column(
            f"{pay_col}_a", pa.array([lut[int(x)] for x in ia], pay_type)
        ).append_column(f"{pay_col}_b", pa.array([lut[int(x)] for x in ib], pay_type))

    return pairs.map_batches(attach, batch_format="pyarrow")


def _join_payload(
    pairs: "ray.data.Dataset",
    payload: "ray.data.Dataset",
    id_col: str,
    pay_col: str,
    num_buckets: int,
    mode: str = "join",
    payload_stage=None,
    pay_type: "pa.DataType | None" = None,
):
    """Attach a per-doc payload to BOTH pair endpoints.

    ``payload_stage`` / ``pay_type``: when given, ``payload`` is the RAW
    doc dataset and the stage computing the payload column runs AFTER
    the endpoint filter (broadcast keep / bloom prescreen) — shingle
    sets / normalized vectors are built only for ~candidate docs instead
    of the whole corpus (second-pass compute cut; at 197k bench docs
    with ~0 candidates, 39.6 s → 9 s for the whole minhash query).

    ``mode``:
      "join":      two bucketed hash joins, (id_a, id_b) ⋈ (id_a,
                   <pay>_a) ⋈ (id_b, <pay>_b) — payload bytes shipped
                   once per doc, not once per (doc, band) as an
                   inline-verify would.
      "prune":     the corpus-scale path — a Bloom filter over the
                   candidate endpoint ids (built distributed,
                   tree-reduce-merged, never O(ids) on the driver)
                   pre-filters the payload table BEFORE the join
                   shuffle, so payload bytes move only for
                   ~candidates×(1+FPR) docs instead of every doc.
                   Bloom false positives merely ship a few extra
                   payload rows — the inner joins against the exact
                   pair set drop them, so output is byte-identical
                   (tested).  Costs two extra pipeline executions.
      "broadcast": the small-pairs fast path (see _broadcast_payload) —
                   zero join shuffles; only valid when the pair set is
                   genuinely small.
      "auto":      count the (materialized) pairs and pick broadcast
                   vs prune at _BROADCAST_MAX_PAIRS, with a measured
                   payload-byte budget (_BROADCAST_MAX_PAYLOAD_BYTES)
                   as the second gate — fat payloads fall back to prune
                   even when the pair count is small.
    """
    if pay_type is None and payload_stage is None:
        # derive the payload column type from the raw payload BEFORE any
        # remapping, so empty-input seeds below know the type (callers
        # using payload_stage pass pay_type explicitly)
        from .join import _schema_types

        _tm = _schema_types(payload)
        pay_type = _tm.get(pay_col) if _tm else None

    from ..state.bloom import BloomFilter
    from .join import _BCAST_CACHE, _hash_col, build_bloom_bytes, hash_join

    if mode not in ("join", "prune", "broadcast", "auto"):
        raise ValueError(f"unknown payload mode {mode!r}")
    if mode == "auto":
        pairs = pairs.materialize()
        if pairs.count() <= _BROADCAST_MAX_PAIRS:
            out = _broadcast_payload(
                pairs,
                payload,
                id_col,
                pay_col,
                byte_budget=_BROADCAST_MAX_PAYLOAD_BYTES,
                payload_stage=payload_stage,
                pay_type=pay_type,
            )
            if out is not None:
                return out
        mode = "prune"
    if mode == "broadcast":
        return _broadcast_payload(
            pairs, payload, id_col, pay_col, payload_stage=payload_stage, pay_type=pay_type
        )
    prune = mode == "prune"
    if prune:
        pairs = pairs.materialize()
        ends = pairs.map_batches(
            lambda t: pa.table(
                {
                    id_col: pa.concat_arrays(
                        [
                            pc.cast(t["id_a"], pa.int64()).combine_chunks(),
                            pc.cast(t["id_b"], pa.int64()).combine_chunks(),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        cap = max(16, 2 * pairs.count())
        bloom_ref = ray.put(build_bloom_bytes(ends, id_col, capacity=cap, fp_rate=0.001))

        def bloom_keep(batch: pa.Table) -> pa.Table:
            bf = _BCAST_CACHE.get(("bloom", bloom_ref.hex()))
            if bf is None:
                bf = BloomFilter.from_bytes(ray.get(bloom_ref))
                _BCAST_CACHE[("bloom", bloom_ref.hex())] = bf
            return batch.filter(pa.array(bf.contains_many(_hash_col(batch[id_col]))))

        payload = payload.map_batches(bloom_keep, batch_format="pyarrow")

    if payload_stage is not None:
        # compute the payload only for rows that survived the prescreen
        # (or for all rows in plain-join mode, matching the old shape)
        payload = payload.map_batches(payload_stage, batch_format="pyarrow")

    a = payload.map_batches(
        lambda t: pa.table({"id_a": pc.cast(t[id_col], pa.int64()), f"{pay_col}_a": t[pay_col]}),
        batch_format="pyarrow",
    )
    b = payload.map_batches(
        lambda t: pa.table({"id_b": pc.cast(t[id_col], pa.int64()), f"{pay_col}_b": t[pay_col]}),
        batch_format="pyarrow",
    )
    # schema-pinned empty seeds: an all-empty payload side (zero
    # candidates / empty corpus) must still present its columns to
    # hash_join, which needs both input schemas to build the union
    if pay_type is not None:
        from .join import _seed_empty

        a = _seed_empty(a, [("id_a", pa.int64()), (f"{pay_col}_a", pay_type)])
        b = _seed_empty(b, [("id_b", pa.int64()), (f"{pay_col}_b", pay_type)])
    j = hash_join(pairs, a, on="id_a", num_buckets=num_buckets)
    return hash_join(j, b, on="id_b", num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def shingle_sets_stage(id_col: str, text_col: str, k: int = 3):
    """map_batches fn: doc → (id, shingle-hash set bytes).  Zero-token
    docs emit nothing (empty sets have no meaningful similarity)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        out_i: List[int] = []
        out_s: List[bytes] = []
        for i, t in zip(ids, batch[text_col].to_pylist()):
            sh = H.shingles(t, k)
            if sh.size == 0:
                continue
            out_i.append(i)
            out_s.append(sh.tobytes())
        return pa.table({id_col: pa.array(out_i, pa.int64()), "sh": pa.array(out_s, pa.binary())})

    return fn


def make_minhash_explode_fn(
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    num_buckets: int = 32,
    payload: str = "sig",
    sig_col: "str | None" = None,
):
    """Stateless map_batches fn: text → one row per (band, doc) with a
    ``band_bucket`` shuffle key.  Hash coefficients live in the hashing
    module's process-global cache (warm across tasks); grouping happens
    on ``band_bucket`` (num_buckets groups) rather than raw band keys so
    the downstream map_groups sees a few large groups, not thousands of
    two-row ones.

    ``payload``: what each band row carries to the bucket —
      "sig":  the 8B×num_perm signature (signature-Jaccard estimate in
              the bucket; the cheap classic).
      "none": id only (~17 B/row) — the bucket emits CANDIDATE pairs and
              exact verification happens after a keyed join of shingle
              sets back onto the deduped candidates.  This is the scale
              path: shuffle bytes are O(docs × bands × 17 B), not
              O(docs × bands × |shingles| × 8 B).  Zero-token docs emit
              nothing (mirrors the exact-Jaccard oracle).

    ``sig_col``: reuse PRECOMPUTED signatures — the column must hold
    ``minhash_signature_fast(shingles(text, k), num_perm).tobytes()``
    exactly (e.g. the enrich stage's stored minhash column); banding
    then never re-tokenizes.  Zero-shingle docs (the all-UINT64_MAX
    empty signature) are skipped on the id-only path, matching the
    text path's zero-token skip.
    """
    ship_sig = payload == "sig"
    empty_sig = np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64).tobytes()

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        srcs = batch[sig_col].to_pylist() if sig_col is not None else batch[text_col].to_pylist()
        out_ids: List[int] = []
        out_keys: List[bytes] = []
        out_sigs: List[bytes] = []
        for i, t in zip(ids, srcs):
            if sig_col is not None:
                if t is None or (not ship_sig and t == empty_sig):
                    continue
                sig = np.frombuffer(t, dtype=np.uint64)
            else:
                sh = H.shingles(t, k)
                if not ship_sig and sh.size == 0:
                    continue
                sig = H.minhash_signature_fast(sh, num_perm)
            sb = sig.tobytes() if ship_sig else b""
            for key in H.lsh_band_keys(sig, bands):
                out_ids.append(i)
                out_keys.append(key)
                out_sigs.append(sb)
        # bucket from the band hash bytes themselves — deterministic across
        # processes (python's hash() is salted per process; never use it
        # for shuffle keys)
        buckets = np.fromiter(
            (int.from_bytes(kk[1:9], "little") % num_buckets for kk in out_keys),
            dtype=np.int32,
            count=len(out_keys),
        )
        cols = {
            "band_bucket": pa.array(buckets),
            "band_key": pa.array(out_keys, pa.binary()),
            id_col: pa.array(out_ids, pa.int64()),
        }
        if ship_sig:
            cols["sig"] = pa.array(out_sigs, pa.binary())
        return pa.table(cols)

    return fn


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    verify: str = "sig",
    num_buckets: int = 32,
    payload_mode: str = "join",
    sig_col: "str | None" = None,
    max_docs_per_key: "int | None" = None,
) -> "ray.data.Dataset":
    """Near-dup pairs from LSH band candidates → Dataset(id_a, id_b, val)
    with id_a < id_b, deduped across bands distributively (the pair set
    never touches the driver; `.to_pandas()` it only at oracle scale).

    verify="sig":   filter candidates on the signature-Jaccard estimate
                    in-bucket → (id_a, id_b, est_jaccard).
    verify="exact": buckets emit candidates ID-ONLY; shingle sets are
                    joined back onto the deduped candidate pairs and
                    EXACT Jaccard computed per pair → (id_a, id_b, jac)
                    — deterministic ground truth, SQL-oracle-comparable
                    (LSH miss prob at threshold 0.9 ≈ 4e-8 per pair),
                    with shuffle payload ~17 B per (doc, band) instead
                    of the full shingle set × bands.

    The band-bucket groupby and the pair-dedup groupby are the wide
    steps; the payload join ships each candidate doc's shingle set once
    per endpoint.

    Tuning (bands, rows=num_perm/bands) — the candidate-volume knob:
    per-band collision prob is j^rows, so few rows per band maximizes
    recall but explodes candidates on template-heavy web text (shared
    boilerplate phrases).  Measured on the 2M-page sf1 proof corpus at
    threshold 0.9: bands=16 (r=4) → 1.54M candidates, ALL rejected by
    exact verify, 296 s dominated by the payload join; bands=8 (r=8) →
    candidates collapse to the broadcast path, 62 s, same output.
    Keep r=4 when the corpus is clean and recall is paramount (the
    oracle-gate configuration: miss prob ≈ 4e-8/pair at j=0.9); use
    r=8 for production web corpora (miss ≤ 1e-2 at exactly j=0.9,
    ≤ 6e-6 for j ≥ 0.97 near-dups).
    """
    if verify == "exact":
        exploded = ds.map_batches(
            make_minhash_explode_fn(
                text_col, id_col, num_perm, bands, k, num_buckets, payload="none",
                sig_col=sig_col,
            ),
            batch_format="pyarrow",
        )

        def bucket_cand(g: pd.DataFrame) -> pd.DataFrame:
            # one vectorized sort + boundary scan; the Python loop runs
            # ONLY over multi-member bands (web-scale LSH bands are
            # overwhelmingly singletons — iterating them all via pandas
            # groupby dominated this stage: 197k docs 39.6 s → 9.3 s)
            bk = g["band_key"].to_numpy()
            ids = g[id_col].to_numpy()
            order = np.argsort(bk, kind="stable")
            bks, idss = bk[order], ids[order]
            _, start, cnt = np.unique(bks, return_index=True, return_counts=True)
            multi = cnt >= 2
            if max_docs_per_key is not None:
                # mega-bucket cap (the simhash/dupspans discipline): an
                # all-duplicates corpus puts thousands of docs in ONE
                # band bucket and the clique emission goes O(m^2) — the
                # 3x stress proof filled 200+ GB of payload-join spill
                # without this.  Capped buckets generate no pairs;
                # default None = exact (the oracle-checked config).
                multi &= cnt <= max_docs_per_key
            out_a: List[np.ndarray] = []
            out_b: List[np.ndarray] = []
            for s, c in zip(start[multi], cnt[multi]):
                u = np.unique(idss[s : s + c])
                if len(u) < 2:
                    continue
                ia, ib = np.triu_indices(len(u), 1)
                out_a.append(u[ia])
                out_b.append(u[ib])
            a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
            b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
            return pd.DataFrame(
                {
                    "id_a": pd.Series(a, dtype="int64"),
                    "id_b": pd.Series(b, dtype="int64"),
                }
            )

        cand = _sc(exploded).groupby("band_bucket").map_groups(bucket_cand, batch_format="pandas")
        uniq = _dedup_pairs(
            cand,
            pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]),
            val_col=None,
            small_guard=_BROADCAST_MAX_PAIRS,
        )
        joined = _join_payload(
            uniq,
            ds,
            id_col,
            "sh",
            num_buckets=16,
            mode=payload_mode,
            payload_stage=shingle_sets_stage(id_col, text_col, k),
            pay_type=pa.binary(),
        )

        def verify_batch(t: pa.Table) -> pa.Table:
            n = len(t)
            sa = t["sh_a"].to_pylist()
            sb = t["sh_b"].to_pylist()
            jac = np.empty(n, dtype=np.float64)
            for i in range(n):
                jac[i] = H.jaccard(
                    np.frombuffer(sa[i], dtype=np.uint64), np.frombuffer(sb[i], dtype=np.uint64)
                )
            keep = jac >= threshold
            tt = t.filter(pa.array(keep))
            return pa.table(
                {
                    "id_a": pc.cast(tt["id_a"], pa.int64()),
                    "id_b": pc.cast(tt["id_b"], pa.int64()),
                    "jac": pa.array(np.round(jac[keep], 4), pa.float64()),
                }
            )

        return joined.map_batches(verify_batch, batch_format="pyarrow")

    # verify == "sig": estimate lives in the bucket; no join-back needed
    exploded = ds.map_batches(
        make_minhash_explode_fn(
            text_col, id_col, num_perm, bands, k, num_buckets, payload="sig",
            sig_col=sig_col,
        ),
        batch_format="pyarrow",
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # singleton bands skipped via one vectorized boundary scan (see
        # the exact-path bucket_cand note)
        bk = g["band_key"].to_numpy()
        order = np.argsort(bk, kind="stable")
        bks = bk[order]
        idss = g[id_col].to_numpy()[order]
        sigss = g["sig"].to_numpy()[order]
        _, start, cnt = np.unique(bks, return_index=True, return_counts=True)
        multi = cnt >= 2
        if max_docs_per_key is not None:  # mega-bucket cap, see exact path
            multi &= cnt <= max_docs_per_key
        rows_a: List[int] = []
        rows_b: List[int] = []
        vals: List[float] = []
        for s, c in zip(start[multi], cnt[multi]):
            ids_band = idss[s : s + c]
            ids, first = np.unique(ids_band, return_index=True)
            if len(ids) < 2:
                continue
            sigs = np.stack([np.frombuffer(x, dtype=np.uint64) for x in sigss[s : s + c][first]])
            for a in range(len(ids)):
                eq = (sigs[a + 1 :] == sigs[a]).mean(axis=1)
                hit = np.nonzero(eq >= threshold)[0]
                for h in hit:
                    rows_a.append(ids[a])
                    rows_b.append(ids[a + 1 + h])
                    vals.append(float(eq[h]))
        return pd.DataFrame(
            {
                "id_a": pd.Series(rows_a, dtype="int64"),
                "id_b": pd.Series(rows_b, dtype="int64"),
                "est_jaccard": pd.Series(vals, dtype="float64"),
            }
        )

    pairs = _sc(exploded).groupby("band_bucket").map_groups(bucket_pairs, batch_format="pandas")
    schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()), ("est_jaccard", pa.float64())])
    return _dedup_pairs(pairs, schema, val_col="est_jaccard", small_guard=_BROADCAST_MAX_PAIRS)


def _local_cc_labels(u: np.ndarray, v: np.ndarray, n_nodes: int) -> np.ndarray:
    """Vectorized in-memory CC over relabeled edges (u, v < n_nodes):
    min-propagation along edges + pointer doubling until fixpoint —
    O(E·log V) numpy work, no per-edge Python loop."""
    lab = np.arange(n_nodes, dtype=np.int64)
    while True:
        old = lab.copy()
        np.minimum.at(lab, u, lab[v])
        np.minimum.at(lab, v, lab[u])
        lab = np.minimum(lab, lab[lab])  # pointer doubling
        lab = lab[lab]
        if np.array_equal(lab, old):
            return lab


def connected_components(
    pairs, id_a: str = "id_a", id_b: str = "id_b", max_iters: int = 50
) -> "ray.data.Dataset":
    """Duplicate-pair graph → cluster labels, two-level distributed CC
    (the local-contraction + label-propagation scheme of Kiveris et al.
    2014, "Connected Components in MapReduce and Beyond"):

    1. CONTRACT: a union-find per edge BLOCK inside map_batches
       (vectorized min-propagation, `_local_cc_labels`) collapses each
       block to star edges (node → block-local root).  Connectivity is
       preserved — every original edge lies inside some block — while
       the iterated graph shrinks from E edges to ≤V rows per block.
    2. INIT: labels = groupby(node).Min over the symmetrized stars
       (one shuffle); label₀(n) = min(n, its star neighbors).
    3. hash-to-min rounds, TWO wide ops each: the neighbor-label
       hash_join, then a bucket-groupby that computes the new per-node
       min AND the changed-count in one pass.  The stars carry an
       explicit SELF-LOOP per node, so the join alone supplies each
       node's own current label as a candidate — the per-round plan is
       one linear chain (join → groupby), with no second union branch
       re-reading ``labels``.  (The earlier diamond plan — ``labels``
       feeding both the join and a unioned self-branch under two
       all-to-all ops — intermittently deadlocked Ray 2.49's streaming
       executor at small CPU counts; r3 fix.)  Fixpoint ⇒ labels
       constant per component = component min; rounds ≤ O(log diameter)
       of the contracted graph — dup clusters contract to depth ≤2, so
       typically one confirm round.

    ``pairs`` may be a pandas DataFrame (small edge lists) OR a
    ray.data.Dataset with the same two columns — at corpus scale the
    pair set never touches the driver.  Returns Dataset(node, component)
    where component = min node id of the cluster; labels stay in the
    object store (write to parquet or join downstream — pandas only in
    oracle harnesses).
    """
    import ray.data as rd

    from .join import hash_join

    empty = rd.from_arrow(
        pa.table({"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())})
    )
    if isinstance(pairs, pd.DataFrame):
        if pairs.empty:
            return empty
        edges_ds = rd.from_pandas(
            pd.DataFrame(
                {"src": pairs[id_a].astype("int64"), "dst": pairs[id_b].astype("int64")}
            )
        )
    else:
        edges_ds = pairs.map_batches(
            lambda t: pa.table(
                {"src": pc.cast(t[id_a], pa.int64()), "dst": pc.cast(t[id_b], pa.int64())}
            ),
            batch_format="pyarrow",
        )

    def contract(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(src) == 0:
            return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
        lab = _local_cc_labels(inv[: len(src)], inv[len(src) :], len(nodes))
        roots = nodes[lab]
        # symmetrized star edges (node→root) ∪ (root→node), plus ONE
        # self-loop per node: the self-loop makes the per-round join
        # carry each node's own label as a candidate (monotone min),
        # removing the union self-branch from the round plan
        m = nodes != roots
        return pa.table(
            {
                "src": pa.array(np.concatenate([nodes[m], roots[m], nodes])),
                "dst": pa.array(np.concatenate([roots[m], nodes[m], nodes])),
            }
        )

    # batch_size=None → one call per block: the union-find sees the whole
    # block's edges, maximizing contraction.  shuffle_coalesce bounds the
    # block count feeding the groupby below AND the per-round hash_join.
    stars = _sc(edges_ds.map_batches(contract, batch_format="pyarrow", batch_size=None))
    if stars.count() == 0:
        return empty

    from .join import bucketed_min

    # two-level min: per-NODE groupby state is O(dup-graph nodes)
    labels = (
        bucketed_min(stars, ["src"], "dst", "__m")
        .map_batches(
            lambda t: pa.table(
                {
                    "node": pc.cast(t["src"], pa.int64()),
                    "component": pc.min_element_wise(
                        pc.cast(t["src"], pa.int64()), pc.cast(t["__m"], pa.int64())
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    NB = 8

    def to_cand(t: pa.Table) -> pa.Table:
        # join row (src, dst, component(src)): candidate for node=dst.
        # The self-loop rows (src==dst) carry the node's OWN label —
        # they keep the min monotone and mark the change-detection base.
        node = pc.cast(t["dst"], pa.int64())
        return pa.table(
            {
                "node": node,
                "cand": pc.cast(t["component"], pa.int64()),
                "__self": pc.cast(pc.equal(t["src"], t["dst"]), pa.int8()),
                "__b": pc.cast(
                    pc.bit_wise_and(node, pa.scalar(NB - 1, pa.int64())), pa.int32()
                ),
            }
        )

    def bucket_min(g: pd.DataFrame) -> pd.DataFrame:
        newlab = g.groupby("node", sort=False)["cand"].min()
        # a node straddling several blocks has one self row per block,
        # all with the same label — dedupe by min before comparing
        selflab = g[g["__self"] == 1].groupby("node")["cand"].min()
        chg = (newlab < selflab.reindex(newlab.index)).astype("int64")
        return pd.DataFrame(
            {
                "node": newlab.index.to_numpy(dtype="int64"),
                "component": newlab.to_numpy(dtype="int64"),
                "__chg": chg.to_numpy(dtype="int64"),
            }
        )

    # Labels live as a DATASET for the whole loop — the driver never
    # materializes a node→label map.  materialize() per round keeps
    # blocks in the object store and cuts the lazy lineage so iteration
    # k doesn't re-execute rounds 1..k-1.  The round plan is one linear
    # chain — labels is consumed exactly once (join right side).
    for _ in range(max_iters):
        upd = (
            _sc(
                hash_join(stars, labels, on="src", right_on="node", num_buckets=NB)
                .map_batches(to_cand, batch_format="pyarrow")
            )
            .groupby("__b")
            .map_groups(bucket_min, batch_format="pandas")
            .materialize()
        )
        n_changed = upd.sum("__chg")
        labels = upd.drop_columns(["__chg"])
        if not n_changed:
            break
    return labels


def simhash_stage(id_col: str, text_col: str, token_hasher=None):
    """token_hasher: text -> uint64[] (default H.token_hashes, the fast
    siphash path; pass H.token_hashes_md5 for the SQL-oracle-checkable
    md5 spec — matches DuckDB md5_number_lower per token)."""
    th = token_hasher or H.token_hashes

    def fn(batch: pa.Table) -> pa.Table:
        sigs = [H.simhash64(th(t)) for t in batch[text_col].to_pylist()]
        return pa.table(
            {
                id_col: batch[id_col],
                "simhash": pa.array(np.array(sigs, dtype=np.uint64)),
            }
        )

    return fn


def simhash_near_dup_pairs(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: "str | None" = None,
    max_hamming: int = 3,
    bands: int = 4,
    num_buckets: int = 32,
    token_hasher=None,
    sig_col: "str | None" = None,
    max_docs_per_key: "int | None" = None,
) -> "ray.data.Dataset":
    """Hamming-ball near-dup pairs over 64-bit SimHash signatures →
    Dataset(id_a, id_b, hamming), id_a < id_b.

    Banding (Charikar 2002 / Manku et al. 2007 table-partition trick):
    the 64-bit signature splits into ``bands`` equal chunks; by
    pigeonhole any pair with ≤ bands-1 differing bits agrees EXACTLY on
    ≥1 chunk, so candidates = rows sharing a (band_idx, chunk) key —
    recall is 100 % for max_hamming ≤ bands-1 (raise ``bands`` for wider
    balls).  One bucket groupby; the 8 B signature rides with each band
    row (no join-back needed); vectorized XOR+popcount verify in-bucket;
    distributed cross-band pair dedup.

    ``sig_col``: reuse PRECOMPUTED 64-bit signatures (e.g. the enrich
    stage already emits one per page) instead of re-tokenizing
    ``text_col`` — the composed-pipeline path at corpus scale.

    ``max_docs_per_key``: band keys held by more rows than this do not
    GENERATE pairs (the dupspans max_docs_per_gram discipline) — on
    template-heavy corpora thousands of pages share a signature chunk
    and one bucket would emit O(m²) pairs (the sf1 proof OOMed a worker
    without it).  Pairs whose every agreeing band is a mega-bucket are
    dropped: a deliberate, spec'd precision knob for corpus scale;
    default None = exact (the oracle-checked configuration).
    """
    if (text_col is None) == (sig_col is None):
        raise ValueError("exactly one of text_col / sig_col is required")
    if max_hamming > bands - 1:
        raise ValueError(f"max_hamming={max_hamming} needs bands >= {max_hamming + 1} for full recall")
    chunk_bits = 64 // bands
    th = token_hasher or H.token_hashes

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if sig_col is not None:
            sigs = batch[sig_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            sigs = np.array(
                [H.simhash64(th(t)) for t in batch[text_col].to_pylist()], dtype=np.uint64
            )
        n = len(ids)
        out_ids = np.repeat(ids, bands)
        out_sigs = np.repeat(sigs, bands)
        band_idx = np.tile(np.arange(bands, dtype=np.uint64), n)
        chunks = (out_sigs >> (band_idx * np.uint64(chunk_bits))) & np.uint64((1 << chunk_bits) - 1)
        # band id disambiguates chunks: chunks < 2^chunk_bits, so shifting
        # band_idx by exactly chunk_bits keeps keys unique for ANY bands
        # (max key = bands·2^(64//bands) < 2^63 — no overflow aliasing).
        band_key = (band_idx << np.uint64(chunk_bits)) | chunks
        return pa.table(
            {
                "band_bucket": pa.array((band_key % np.uint64(num_buckets)).astype(np.int32)),
                "band_key": pa.array(band_key),
                id_col: pa.array(out_ids),
                "sig": pa.array(out_sigs),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # singleton bands skipped via one vectorized boundary scan (see
        # minhash bucket_cand note)
        bk = g["band_key"].to_numpy()
        order = np.argsort(bk, kind="stable")
        bks = bk[order]
        idss = g[id_col].to_numpy()[order]
        sigss = g["sig"].to_numpy()[order].astype(np.uint64)
        _, start, cnt = np.unique(bks, return_index=True, return_counts=True)
        multi = cnt >= 2
        if max_docs_per_key is not None:
            multi &= cnt <= max_docs_per_key
        rows_a: List[int] = []
        rows_b: List[int] = []
        hams: List[int] = []
        for s, c in zip(start[multi], cnt[multi]):
            ids, first = np.unique(idss[s : s + c], return_index=True)
            m = len(ids)
            if m < 2:
                continue
            sigs = sigss[s : s + c][first]
            for a in range(m - 1):
                x = np.bitwise_xor(sigs[a + 1 :], sigs[a])
                ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
                hit = np.nonzero(ham <= max_hamming)[0]
                rows_a.extend([ids[a]] * len(hit))
                rows_b.extend(ids[a + 1 + hit])
                hams.extend(ham[hit])
        return pd.DataFrame(
            {
                "id_a": pd.Series(rows_a, dtype="int64"),
                "id_b": pd.Series(rows_b, dtype="int64"),
                "hamming": pd.Series(hams, dtype="int64"),
            }
        )

    pairs = (
        _sc(ds.map_batches(explode, batch_format="pyarrow"))
        .groupby("band_bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()), ("hamming", pa.int64())])
    return _dedup_pairs(pairs, schema, val_col="hamming", small_guard=_BROADCAST_MAX_PAIRS)


# ---------------------------------------------------------------------------
# Embedding near-dup via SRP-LSH (signed random projections)
#
# The scale path the r1 review demanded: NO driver-side matrix, NO O(N²)
# all-pairs.  Each worker derives the same hyperplane matrix from a seed
# (pure function — nothing broadcast), vectors explode to one row per
# LSH band (band_key = packed sign bits), a single groupby(bucket)
# shuffle co-locates candidates, and a margin-widened fp16 cosine screen
# emits candidate pairs; survivors are re-checked EXACTLY in float64 via
# keyed joins of the full-precision vectors.  Recall: p_bit =
# 1 - acos(t)/π; with rbits=6, bands=24 a cos≥0.95 pair is missed with
# prob (1-p_bit^6)^24 ≈ 1.5e-8, and the fp16 screen's error (≤ ~3e-3
# for unit vectors) is far inside the 0.02 margin, so the exact re-check
# sees every true pair.
#
# Shuffle volume = bands × (8B id + 2B·d fp16 vec) per vector — 4× less
# than shipping float64 — plus one 8B·d float64 vector per candidate
# ENDPOINT (not per band) for the re-check.
# ---------------------------------------------------------------------------

_SRP_PLANES: dict = {}

#: fp16 screen margin: unit-vector fp16 rounding error on a dot product
#: is ≤ ~3e-3 (2^-11 per component, Cauchy-Schwarz-bounded sum); 0.02
#: leaves ~6× headroom so the screen can only ADD candidates, never drop
#: a true pair before the exact re-check.
_FP16_MARGIN = 0.02


def _srp_planes(d: int, bands: int, rbits: int, seed: int) -> np.ndarray:
    """(bands·rbits, d) hyperplanes — deterministic per (d,bands,rbits,seed),
    regenerated identically in every worker process (cached)."""
    key = (d, bands, rbits, seed)
    H = _SRP_PLANES.get(key)
    if H is None:
        H = np.random.default_rng(seed).standard_normal((bands * rbits, d))
        _SRP_PLANES[key] = H
    return H


def _normalize_f64(batch_col) -> np.ndarray:
    from .knn import _to_matrix

    V = _to_matrix(batch_col).astype(np.float64, copy=False)
    if V.size == 0:
        return V
    return V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)


def make_srp_explode_fn(
    vec_col: str,
    id_col: str,
    bands: int = 24,
    rbits: int = 6,
    seed: int = 42,
    num_buckets: int = 32,
    ship_vec: bool = True,
):
    """map_batches fn: vector → one row per band with packed sign-bit
    band_key, shuffle bucket, and (``ship_vec``) the L2-normalized
    vector QUANTIZED to fp16 (2 B/dim — the in-bucket screen payload;
    the exact float64 verify happens after the candidate join-back, so
    quantization here only affects which pairs are screened in, never
    the output values).  ``ship_vec=False`` emits 16 B/row id-only band
    rows (the minhash id-only discipline) for the screenless candidate
    path — right when rbits is sized so in-key populations are O(1)."""

    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        Vn = _normalize_f64(batch[vec_col])
        if n == 0 or Vn.size == 0:
            cols = {
                "band_bucket": pa.array([], pa.int32()),
                "band_key": pa.array([], pa.binary()),
                id_col: pa.array([], pa.int64()),
            }
            if ship_vec:
                cols["vec16"] = pa.array([], pa.binary())
            return pa.table(cols)
        Hp = _srp_planes(Vn.shape[1], bands, rbits, seed)
        bits = (Vn @ Hp.T) > 0.0  # (n, bands*rbits)
        packed = np.packbits(bits.reshape(n, bands, rbits), axis=2)  # (n, bands, ⌈rbits/8⌉)
        vec_bytes = None
        if ship_vec:
            V16 = Vn.astype(np.float16)
            vec_bytes = [V16[i].tobytes() for i in range(n)]
        out_ids = np.repeat(ids, bands)
        out_keys: List[bytes] = []
        out_vecs: List[bytes] = []
        buckets = np.empty(n * bands, dtype=np.int32)
        w = 0
        for i in range(n):
            for b in range(bands):
                kb = bytes([b]) + packed[i, b].tobytes()
                out_keys.append(kb)
                if ship_vec:
                    out_vecs.append(vec_bytes[i])
                buckets[w] = (b * 2654435761 + int.from_bytes(packed[i, b].tobytes(), "little")) % num_buckets
                w += 1
        cols = {
            "band_bucket": pa.array(buckets),
            "band_key": pa.array(out_keys, pa.binary()),
            id_col: pa.array(out_ids, pa.int64()),
        }
        if ship_vec:
            cols["vec16"] = pa.array(out_vecs, pa.binary())
        return pa.table(cols)

    return fn


def srp_near_dup_pairs(
    ds: "ray.data.Dataset",
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    bands: int = 24,
    rbits: int = 6,
    seed: int = 42,
    num_buckets: int = 32,
    payload_mode: str = "join",
    max_docs_per_key: "int | None" = None,
    band_payload: str = "vec16",
) -> "ray.data.Dataset":
    """Cosine near-dup pairs → Dataset(id_a, id_b, cos_sim) with
    id_a < id_b and round(cos,4) ≥ threshold; the exact comparator is
    float64 on L2-normalized vectors, identical to the all-pairs oracle.

    LSH-bucketed: candidates are only pairs agreeing on a full sign-bit
    band; the bucket screen runs on fp16 vectors with a safety margin
    (see _FP16_MARGIN), candidate pairs are deduped distributively, and
    the full-precision vectors are joined back for the exact re-check.
    The driver never sees a vector or the pair set.

    Sizing at corpus scale: a band key has 2^rbits values, so the
    average in-key population is N/2^rbits and the screen does O(m²)
    fp16 dot products per key — rbits MUST grow with log2(N) (rbits=24
    at the 2M-row sf1 proof; the default 6 is the small-N/recall-max
    oracle tuning and would put ~34k vectors in every key there).
    ``max_docs_per_key`` (the simhash/dupspans mega-bucket discipline)
    additionally skips degenerate keys as pair generators.

    ``band_payload``: "vec16" (default) ships the fp16 vector with each
    band row so buckets can pre-screen candidates; "id" ships 16 B/row
    id-only band rows and emits every distinct in-key pair unscreened —
    byte-identical output either way (the exact float64 re-check
    decides; mode-equality tested).  MEASURED trade (sf1 probe, 2.26M
    uniform 64-d vectors, rbits=24/bands=12): id-only cut the band
    exchange 9× but shipped ~N²·bands/2^(rbits+1) ≈ 1.8M random in-key
    collision pairs into the pair-dedup + full-vector join-back —
    128 s vs 20.7 s for vec16, whose screen kills those collisions
    in-bucket.  Keep vec16 unless the collision volume is provably
    negligible (rbits ≫ log2 N, or strongly clustered vectors)."""
    if band_payload not in ("vec16", "id"):
        raise ValueError(f"unknown band_payload {band_payload!r}")
    ship_vec = band_payload == "vec16"
    exploded = ds.map_batches(
        make_srp_explode_fn(vec_col, id_col, bands, rbits, seed, num_buckets, ship_vec=ship_vec),
        batch_format="pyarrow",
    )
    screen = threshold - _FP16_MARGIN

    def bucket_cand(g: pd.DataFrame) -> pd.DataFrame:
        # singleton bands skipped via one vectorized boundary scan (see
        # minhash bucket_cand note)
        bk = g["band_key"].to_numpy()
        order = np.argsort(bk, kind="stable")
        bks = bk[order]
        idss = g[id_col].to_numpy()[order]
        vecss = g["vec16"].to_numpy()[order]
        _, start, cnt = np.unique(bks, return_index=True, return_counts=True)
        multi = cnt >= 2
        if max_docs_per_key is not None:
            multi &= cnt <= max_docs_per_key
        rows_a: List[int] = []
        rows_b: List[int] = []
        for s, c in zip(start[multi], cnt[multi]):
            ids, first = np.unique(idss[s : s + c], return_index=True)
            m = len(ids)
            if m < 2:
                continue
            vecs = vecss[s : s + c][first]
            X = np.frombuffer(b"".join(vecs), dtype=np.float16).reshape(m, -1).astype(np.float32)
            # blocked screen: the dense m×m similarity matrix is 4m²
            # bytes (4.6 GB at the 34k-row keys an undersized rbits
            # produces) — row blocks bound peak memory at blk×m
            BLK = 1024
            cols = np.arange(m)
            for b0 in range(0, m - 1, BLK):
                b1 = min(b0 + BLK, m)
                S = X[b0:b1] @ X.T  # (blk, m)
                mask = (S >= screen) & (cols[None, :] > (b0 + np.arange(b1 - b0))[:, None])
                ra, rb = np.nonzero(mask)
                rows_a.extend(ids[b0 + ra])
                rows_b.extend(ids[rb])
        return pd.DataFrame(
            {
                "id_a": pd.Series(rows_a, dtype="int64"),
                "id_b": pd.Series(rows_b, dtype="int64"),
            }
        )

    def bucket_cand_id(g: pd.DataFrame) -> pd.DataFrame:
        # screenless candidates: every distinct in-key pair (the exact
        # re-check filters) — the id-only exchange path
        bk = g["band_key"].to_numpy()
        order = np.argsort(bk, kind="stable")
        bks, idss = bk[order], g[id_col].to_numpy()[order]
        _, start, cnt = np.unique(bks, return_index=True, return_counts=True)
        multi = cnt >= 2
        if max_docs_per_key is not None:
            multi &= cnt <= max_docs_per_key
        out_a: List[np.ndarray] = []
        out_b: List[np.ndarray] = []
        for st_, c in zip(start[multi], cnt[multi]):
            u = np.unique(idss[st_ : st_ + c])
            if len(u) < 2:
                continue
            ia, ib = np.triu_indices(len(u), 1)
            out_a.append(u[ia])
            out_b.append(u[ib])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        return pd.DataFrame(
            {"id_a": pd.Series(a, dtype="int64"), "id_b": pd.Series(b, dtype="int64")}
        )

    cand = (
        _sc(exploded)
        .groupby("band_bucket")
        .map_groups(bucket_cand if ship_vec else bucket_cand_id, batch_format="pandas")
    )
    uniq = _dedup_pairs(
        cand,
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]),
        val_col=None,
        small_guard=_BROADCAST_MAX_PAIRS,
    )

    def vec_table(t: pa.Table) -> pa.Table:
        Vn = _normalize_f64(t[vec_col])
        return pa.table(
            {
                id_col: pc.cast(t[id_col], pa.int64()),
                "vecb": pa.array([Vn[i].tobytes() for i in range(len(t))], pa.binary()),
            }
        )

    joined = _join_payload(
        uniq,
        ds,
        id_col,
        "vecb",
        num_buckets=16,
        mode=payload_mode,
        payload_stage=vec_table,
        pay_type=pa.binary(),
    )

    def verify_batch(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        A = np.frombuffer(b"".join(t["vecb_a"].to_pylist()), dtype=np.float64).reshape(n, -1)
        B = np.frombuffer(b"".join(t["vecb_b"].to_pylist()), dtype=np.float64).reshape(n, -1)
        cos = np.round(np.einsum("ij,ij->i", A, B), 4)
        keep = cos >= threshold
        tt = t.filter(pa.array(keep))
        return pa.table(
            {
                "id_a": pc.cast(tt["id_a"], pa.int64()),
                "id_b": pc.cast(tt["id_b"], pa.int64()),
                "cos_sim": pa.array(cos[keep], pa.float64()),
            }
        )

    out = joined.map_batches(verify_batch, batch_format="pyarrow")
    from .join import _seed_empty

    # schema-pinned empty seed: zero-candidate runs keep the contract
    return _seed_empty(
        out,
        [("id_a", pa.int64()), ("id_b", pa.int64()), ("cos_sim", pa.float64())],
    )


def cluster_representatives(
    labels: "ray.data.Dataset",
    scores: "ray.data.Dataset",
    id_col: str,
    score_col: str,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Keep-policy for near-dup clusters: per cluster, the member with
    the HIGHEST score survives (ties → smallest id) — the real dedup
    keep rule of a training-data pipeline (keep the longest / highest
    quality copy), generalizing J5's 'first-wins' to score-wins.

    ``labels`` = connected_components output (node, component);
    ``scores`` = slim (id, score) rows — compute them in map_batches
    from the payload, never ship the payload here.  One bucketed hash
    join + one groupby(component); group size = cluster size.

    → Dataset(component, rep_<id>, cluster_size, rep_<score>).
    """
    from .join import hash_join

    sl = scores.map_batches(
        lambda t: pa.table(
            {
                "__sid": pc.cast(t[id_col], pa.int64()),
                "__score": pc.cast(t[score_col], pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )
    j = hash_join(labels, sl, on="node", right_on="__sid", num_buckets=num_buckets)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__score", "node"], ascending=[False, True], kind="mergesort")
        top = g.iloc[0]
        return pd.DataFrame(
            {
                "component": pd.Series([top["component"]], dtype="int64"),
                f"rep_{id_col}": pd.Series([top["node"]], dtype="int64"),
                "cluster_size": pd.Series([len(g)], dtype="int64"),
                f"rep_{score_col}": pd.Series([top["__score"]], dtype="float64"),
            }
        )

    return _sc(j).groupby("component").map_groups(pick, batch_format="pandas")
