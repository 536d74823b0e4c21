"""Join strategies: broadcast semi/anti join and bucketed hash join.

The reference has only key-value lookups (SURVEY.md §2.4 J1-J3); these
are the distributed generalizations:

- broadcast_filter: small-side key set shipped once via ``ray.put``,
  membership test vectorized inside map_batches — the semi/anti join
  (J4's seen-set anti-join shape).  At 10^9+ keys use
  ``bloom_semi_anti`` below: a distributed-built Bloom filter prescreen
  plus an exact hash-join verify of the positive minority.
- hash_join: both sides large → add ``bucket = hash(key) % B`` to each
  side, tag side, union (schemas null-aligned), and a single
  ``groupby(bucket)`` shuffle co-locates matching keys of BOTH sides;
  pandas-merge inside map_groups.  Salt hot keys by raising B.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


# key-set cache per worker process (ray workers are long-lived; the
# object-store read + arrow conversion happens once per process, not
# per batch, without paying actor-pool spin-up)
_BCAST_CACHE: dict = {}


#: Ray inlines objects under ~100 KB into the OWNER's (the driver's)
#: in-process store.  A sort/groupby all-to-all emits ~M_in × M_out
#: chunks, so a slim table arriving in many small blocks makes every
#: chunk sub-inline and the DRIVER accumulates the entire shuffle in its
#: heap: the 532-block / 800 MB anchor-partials table at the sf1 proof
#: measured +3.7 GB driver anon-RSS and 26 s for one groupby; after
#: coalescing to 48 blocks the same groupby was +13 MB and 1.8 s.
#: shuffle_coalesce() bounds the map side to ~sqrt(bytes/chunk_target)
#: blocks so emitted chunks stay comfortably above the inline threshold.
_SHUFFLE_CHUNK_BYTES = 256 * 1024
_SHUFFLE_MIN_BLOCKS = 16


def shuffle_coalesce(
    ds: "ray.data.Dataset", min_blocks: int = _SHUFFLE_MIN_BLOCKS
) -> "ray.data.Dataset":
    """Bound the map-side block count of an imminent all-to-all (see the
    inline-threshold note above).  Materializes (the sort barrier holds
    every block anyway, so peak storage is unchanged) and, when the
    block count is well past ~sqrt(bytes / _SHUFFLE_CHUNK_BYTES), does
    one split/merge repartition — NOT a shuffle — down to that target.
    Small inputs (fewer blocks than the target) pass through untouched."""
    m = ds.materialize()
    nb = m.num_blocks()
    target = max(min_blocks, int(np.sqrt((m.size_bytes() or 0) / _SHUFFLE_CHUNK_BYTES)))
    if nb > 2 * target:
        return m.repartition(target)
    return m


def cached_get(ref, slot: str):
    """Per-worker cached ray.get with a BOUNDED one-entry-per-slot
    policy: iterating callers (pagerank rounds, successive dedup runs)
    put a NEW large object each round — keying the cache by ref would
    retain every round's ~100s-of-MB object for the worker's lifetime.
    A slot holds only the latest (ref, value); a changed ref evicts the
    previous entry."""
    ent = _BCAST_CACHE.get(slot)
    hx = ref.hex()
    if ent is not None and ent[0] == hx:
        return ent[1]
    val = ray.get(ref)
    _BCAST_CACHE[slot] = (hx, val)
    return val


def broadcast_filter(
    ds: "ray.data.Dataset",
    column: str,
    keys_ref: "ray.ObjectRef",
    keep_in: bool = True,
) -> "ray.data.Dataset":
    """Semi (keep_in=True) / anti (False) join against a broadcast key set.

    ``keys_ref`` is ``ray.put(sorted_list_or_set)`` — placed in the
    object store ONCE on the driver; each worker process materializes
    the Arrow value-set once (module-level cache) and filters batches
    with the vectorized ``is_in`` kernel.
    """

    def filt(batch: pa.Table) -> pa.Table:
        keys = _BCAST_CACHE.get(keys_ref.hex())
        if keys is None:
            keys = pa.array(sorted(ray.get(keys_ref)))
            _BCAST_CACHE[keys_ref.hex()] = keys
        mask = pc.is_in(batch[column], value_set=keys)
        if not keep_in:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow")


#: rows at which a slim lookup table still broadcasts comfortably
#: (~100 MB for two string/int columns) — the stages/ngramlm.py
#: guarded-broadcast budget applied to lookup joins
_MAX_LOOKUP_BROADCAST_ROWS = 3_000_000


def broadcast_lookup_table(right: "ray.data.Dataset"):
    """Collect a (materialized) small right side ONCE → (object ref,
    column names) for sharing across several :func:`lookup_join` calls
    against the same table (e.g. both degree attachments of the triangle
    family) — one driver pull + one object-store copy instead of one per
    join.  Returns None when the right side has no recoverable blocks."""
    parts = [t for t in ray.get(right.to_arrow_refs()) if t.num_columns > 0]
    if not parts:
        return None
    rt = pa.concat_tables(parts, promote_options="default").combine_chunks()
    return ray.put(rt), list(rt.schema.names)


def lookup_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: Optional[str] = None,
    rename: Optional[dict] = None,
    max_broadcast_rows: int = _MAX_LOOKUP_BROADCAST_ROWS,
    num_buckets: int = 32,
    right_ref=None,
) -> "ray.data.Dataset":
    """INNER join that attaches the value columns of a UNIQUE-keyed
    right side onto ``left`` — guarded broadcast with shuffle fallback
    (the stages/ngramlm.py discipline):

    * right.count() ≤ ``max_broadcast_rows``: the right table is pulled
      block-refs-only and ``ray.put`` ONCE; each probe batch does a
      vectorized ``pc.index_in`` against the key column and ``pc.take``s
      the value columns — zero shuffle, left stays streaming.
    * larger: the bucketed ``hash_join`` (one all-to-all) — the 10^10-row
      degree-table shape.

    Both paths emit identical schemas: left columns + right value
    columns (``rename`` maps right names → output names); the right key
    column is never emitted.  Right keys MUST be unique (degree /
    dimension tables) — duplicate right keys would need the hash_join's
    row-multiplying semantics, use it directly.
    """
    rkey = right_on or on
    rename = rename or {}
    if right_ref is None:
        # materialize once: count() executes the lineage anyway, and both
        # the broadcast collect and the fallback join re-consume it
        right = right.materialize()
    if right_ref is not None or right.count() <= max_broadcast_rows:
        prepared = right_ref if right_ref is not None else broadcast_lookup_table(right)
        if prepared is None:
            # empty right with no recoverable blocks: emit an empty
            # dataset with the CONTRACT schema (left cols + renamed right
            # value cols) — left.limit(0) alone would silently drop the
            # value columns the non-empty path appends
            r_schema = right.schema()
            l_schema = left.schema()
            if r_schema is None or l_schema is None:
                raise ValueError(
                    "lookup_join: empty input lost its schema — seed it "
                    "with a schema-pinned empty block (_seed_empty) first"
                )
            fields = [(n, _arrow_type(t)) for n, t in zip(l_schema.names, l_schema.types)]
            fields += [
                (rename.get(n, n), _arrow_type(t))
                for n, t in zip(r_schema.names, r_schema.types)
                if n != rkey
            ]
            return ray.data.from_arrow(pa.schema(fields).empty_table())
        ref, names = prepared
        val_cols = [c for c in names if c != rkey]
        slot = f"lookup:{on}->{rkey}:{','.join(val_cols)}"

        def attach(batch: pa.Table) -> pa.Table:
            r = cached_get(ref, slot)
            idx = pc.index_in(batch[on], value_set=r[rkey].combine_chunks())
            mask = pc.is_valid(idx)
            batch = batch.filter(mask)
            idx = idx.filter(mask)
            for c in val_cols:
                batch = batch.append_column(
                    rename.get(c, c), pc.take(r[c].combine_chunks(), idx)
                )
            return batch

        return left.map_batches(attach, batch_format="pyarrow")

    j = hash_join(left, right, on=on, right_on=rkey, how="inner", num_buckets=num_buckets)
    l_names = list(left.schema().names)
    out_map = [
        (c, rename.get(c, c))
        for c in right.schema().names
        if c != rkey
    ]

    def project(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in l_names}
        for src, dst in out_map:
            cols[dst] = batch[src]
        return pa.table(cols)

    return j.map_batches(project, batch_format="pyarrow")


def _hash_col(col) -> np.ndarray:
    """Deterministic uint64 hash of a key column (pandas siphash — same
    result in every process; both join sides MUST use this)."""
    if pa.types.is_integer(col.type):
        return pd.util.hash_array(col.to_numpy(zero_copy_only=False).astype(np.int64))
    return pd.util.hash_array(np.asarray(col.to_pylist(), dtype=object), categorize=False)


@ray.remote
def _bloom_leaf(block: pa.Table):
    """OR-merge the partial blooms of one block → (bits bytes | None, n)."""
    merged = None
    total = 0
    names = block.schema.names if hasattr(block, "schema") else list(block.columns)
    if "bloom" not in names:  # schema-less empty block from an upstream groupby
        return (None, 0)
    for blob, n in zip(block["bloom"].to_pylist(), block["n"].to_pylist()):
        arr = np.frombuffer(blob, dtype=np.uint64)
        merged = arr.copy() if merged is None else np.bitwise_or(merged, arr, out=merged)
        total += int(n)
    return (merged.tobytes() if merged is not None else None, total)


@ray.remote
def _bloom_or(x, y):
    bx, nx = x
    by, ny = y
    if bx is None:
        return (by, nx + ny)
    if by is None:
        return (bx, nx + ny)
    a = np.bitwise_or(np.frombuffer(bx, dtype=np.uint64), np.frombuffer(by, dtype=np.uint64))
    return (a.tobytes(), nx + ny)


def build_bloom_bytes(keys_ds, column: str, capacity: int, fp_rate: float = 0.01, batch_size: int = 65536):
    """Distributed Bloom build with a TREE-REDUCED OR-merge: each task
    builds a partial filter over its batch, then a binary tree of Ray
    tasks OR-merges the bit arrays so the driver touches O(1) blobs and
    the merge work spreads across the cluster (the r2 serial driver loop
    would stream ~15k × 1.2 GB partials through one process at 10^9
    keys).  OR is associative + commutative, so the bits are identical
    to any merge order."""
    from ..state.bloom import BloomFilter

    def partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(capacity, fp_rate)
        bf.add_many(_hash_col(batch[column]))
        return pa.table(
            {"bloom": pa.array([bf.bits.tobytes()], pa.large_binary()), "n": pa.array([len(batch)], pa.int64())}
        )

    parts = keys_ds.map_batches(partial, batch_size=batch_size, batch_format="pyarrow").materialize()
    refs = []
    for bundle in parts.iter_internal_ref_bundles():
        refs.extend(_bloom_leaf.remote(br) for br in bundle.block_refs)
    bf = BloomFilter(capacity, fp_rate)
    if not refs:
        return bf.to_bytes()
    while len(refs) > 1:
        nxt = [_bloom_or.remote(refs[i], refs[i + 1]) for i in range(0, len(refs) - 1, 2)]
        if len(refs) % 2:
            nxt.append(refs[-1])
        refs = nxt
    bits, total = ray.get(refs[0])
    if bits is not None:
        bf.bits = np.frombuffer(bits, dtype=np.uint64).copy()
    bf.count = total
    return bf.to_bytes()


def bloom_semi_anti(
    ds: "ray.data.Dataset",
    column: str,
    keys_ds: "ray.data.Dataset",
    key_col: str,
    keep_in: bool = False,
    fp_rate: float = 0.01,
    num_buckets: int = 32,
    capacity: Optional[int] = None,
) -> "ray.data.Dataset":
    """EXACT semi/anti join for key cardinalities where a driver-side key
    list is impossible (the 10^9-key path promised at the module head):

    1. Bloom over the key side, built distributed and OR-merged — the
       driver holds only the bit array (~1.2 GB per 10^9 keys at 1% FPR).
    2. Bloom-NEGATIVE probe rows are DEFINITELY keyless → emitted
       directly for anti, dropped for semi (no shuffle for ~99% of a
       mostly-novel stream).
    3. The bloom-positive minority is exactly verified against the key
       Dataset with the bucketed hash_join (FPR-sized shuffle only).

    Output rows == the exact semi/anti join (bloom errors only route rows
    to the verify path, never change the answer).
    """
    from ..state.bloom import BloomFilter

    # materialize once: count() below executes anyway, the bloom build
    # scans it, and the verify join needs a concrete schema
    keys_ds = keys_ds.materialize()
    n_keys = keys_ds.count()
    if n_keys == 0:  # empty key set: anti keeps everything, semi nothing
        return ds if not keep_in else ds.limit(0)
    cap = capacity if capacity is not None else max(16, n_keys)
    bloom_ref = ray.put(build_bloom_bytes(keys_ds, key_col, cap, fp_rate))

    def make_split(want_positive: bool):
        def split(batch: pa.Table) -> pa.Table:
            bf = _BCAST_CACHE.get(("bloom", bloom_ref.hex()))
            if bf is None:
                bf = BloomFilter.from_bytes(ray.get(bloom_ref))
                _BCAST_CACHE[("bloom", bloom_ref.hex())] = bf
            m = bf.contains_many(_hash_col(batch[column]))
            return batch.filter(pa.array(m if want_positive else ~m))

        return split

    # an all-negative (or all-empty) probe side leaves positives — and
    # the verified output — with zero blocks; Ray drops them, the join
    # would see no schema and to_pandas() would go column-less.  Seed
    # both from the probe schema so the plan stays total.
    ds_schema = ds.schema()
    if ds_schema is None:
        raise ValueError(
            "bloom_semi_anti probe side has no schema (all-empty dataset "
            "whose blocks were dropped) — seed it with a schema-pinned "
            "empty block (_seed_empty) first"
        )
    seed_fields = [(n, _arrow_type(t)) for n, t in zip(ds_schema.names, ds_schema.types)]
    positives = _seed_empty(
        ds.map_batches(make_split(True), batch_format="pyarrow"), seed_fields
    )
    marked = keys_ds.map_batches(
        lambda t: pa.table(
            {key_col: t[key_col], "__hit": pa.array(np.ones(len(t), dtype=np.int8))}
        ),
        batch_format="pyarrow",
    )
    j = hash_join(positives, marked, on=column, right_on=key_col, how="left", num_buckets=num_buckets)
    out_cols = list(ds_schema.names)

    def finish(batch: pa.Table) -> pa.Table:
        hit = pc.is_valid(batch["__hit"])
        keep = hit if keep_in else pc.invert(hit)
        return batch.filter(keep).select(out_cols)

    checked = _seed_empty(j.map_batches(finish, batch_format="pyarrow"), seed_fields)
    if keep_in:
        return checked
    negatives = ds.map_batches(make_split(False), batch_format="pyarrow")
    return negatives.union(checked)


def _arrow_type(t) -> pa.DataType:
    """Coerce a Ray schema type (arrow / numpy / python) to pa.DataType."""
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(np.dtype(t))
    except (TypeError, pa.ArrowNotImplementedError):
        return pa.string()  # pandas object dtype → string


def _key_buckets(k: pa.ChunkedArray | pa.Array, num_buckets: int) -> np.ndarray:
    if pa.types.is_integer(k.type):
        v = k.to_numpy(zero_copy_only=False).astype(np.uint64)
        return (v % np.uint64(num_buckets)).astype(np.int32)
    if pa.types.is_floating(k.type):
        # integral floats (e.g. an upstream pandas int→float promotion)
        # must bucket IDENTICALLY to their int representation or the two
        # sides of a join land in different buckets and matches are lost
        v = k.to_numpy(zero_copy_only=False)
        if np.all(np.isfinite(v)) and np.all(v == np.floor(v)):
            return (v.astype(np.int64).astype(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
    h = pd.util.hash_array(np.asarray(k.to_pylist(), dtype=object), categorize=False)
    return (h % np.uint64(num_buckets)).astype(np.int32)


def _schema_types(*dss) -> "dict | None":
    """Column → pa.DataType map from the first dataset with a known
    schema.  A materialized ALL-EMPTY dataset reports schema() None, so
    seed callers pass the pre-map input as fallback (schema() on a lazy
    dataset may execute one block — trivial in the empty case this
    guards)."""
    for d in dss:
        sch = d.schema()
        if sch is not None:
            return {n: _arrow_type(t) for n, t in zip(sch.names, sch.types)}
    return None


def _seed_empty(out: "ray.data.Dataset", fields: list) -> "ray.data.Dataset":
    """Union a schema-pinned empty block onto a groupby/map_groups result
    so an all-empty result keeps its schema — Ray drops empty blocks, and
    a column-less dataset crashes downstream select/filter stages (the
    same pathology as the hash_join empty-result seed below).  ``fields``
    = [(name, pa.DataType), ...] in output column order."""
    return ray.data.from_arrow(pa.schema(fields).empty_table()).union(out)


def bucketed_distinct(
    ds: "ray.data.Dataset", cols: list, num_buckets: int = 64
) -> "ray.data.Dataset":
    """DISTINCT over ``cols`` as a two-level plan: hash-bucket rows into
    ``num_buckets`` groups, then ONE pandas drop_duplicates per group.
    Ray's groupby(cols).aggregate carries per-DISTINCT-key aggregate
    state — measured ~80 s at 2M string groups / 8M rows vs ~seconds for
    this shape (sf1 proof, BASELINE.md r4).  Output columns = cols."""

    def add_pb(t: pa.Table) -> pa.Table:
        h = np.zeros(len(t), dtype=np.uint64)
        for c in cols:
            h = h * np.uint64(1099511628211) ^ _hash_col(t[c])
        return t.select(cols).append_column("__pb", pa.array((h % np.uint64(num_buckets)).astype(np.int32)))

    def dg(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(cols)[cols]
        return pa.Table.from_pandas(
            df,
            schema=pa.schema([(c, t.schema.field(c).type) for c in cols]),
            preserve_index=False,
        )

    slim = shuffle_coalesce(ds.map_batches(add_pb, batch_format="pyarrow"))
    out = slim.groupby("__pb").map_groups(dg, batch_format="pyarrow")
    tmap = _schema_types(slim, ds)
    if tmap is None:
        return out
    return _seed_empty(out, [(c, tmap[c]) for c in cols])


def bucketed_min(
    ds: "ray.data.Dataset",
    key_cols: list,
    val_col: str,
    out_col: str,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Per-key MIN as the same two-level plan as :func:`bucketed_sum` —
    for min-reductions whose DISTINCT key count is O(rows) (connected-
    components label contraction).  Output = key_cols + [out_col]."""

    def add_pb(t: pa.Table) -> pa.Table:
        h = np.zeros(len(t), dtype=np.uint64)
        for c in key_cols:
            h = h * np.uint64(1099511628211) ^ _hash_col(t[c])
        return t.select(key_cols + [val_col]).append_column(
            "__pb", pa.array((h % np.uint64(num_buckets)).astype(np.int32))
        )

    def agg(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.groupby(key_cols, as_index=False, sort=False)[val_col].min().rename(
            columns={val_col: out_col}
        )
        return pa.Table.from_pandas(
            out,
            schema=pa.schema(
                [(c, t.schema.field(c).type) for c in key_cols]
                + [(out_col, t.schema.field(val_col).type)]
            ),
            preserve_index=False,
        )

    slim = shuffle_coalesce(ds.map_batches(add_pb, batch_format="pyarrow"))
    out = slim.groupby("__pb").map_groups(agg, batch_format="pyarrow")
    tmap = _schema_types(slim, ds)
    if tmap is None:
        return out
    return _seed_empty(
        out, [(c, tmap[c]) for c in key_cols] + [(out_col, tmap[val_col])]
    )


def bucketed_sum(
    ds: "ray.data.Dataset",
    key_cols: list,
    val_col: str,
    out_col: str,
    num_buckets: int = 64,
    count: bool = False,
) -> "ray.data.Dataset":
    """Per-key SUM (or COUNT with ``count=True``) as the same two-level
    plan as :func:`bucketed_distinct` — for aggregations whose DISTINCT
    key count is O(rows) (per-node rank mass, out-degrees), where Ray's
    per-group aggregate state dominates.  Output = key_cols + [out_col].
    """

    def add_pb(t: pa.Table) -> pa.Table:
        h = np.zeros(len(t), dtype=np.uint64)
        for c in key_cols:
            h = h * np.uint64(1099511628211) ^ _hash_col(t[c])
        keep = key_cols + ([] if count else [val_col])
        return t.select(keep).append_column("__pb", pa.array((h % np.uint64(num_buckets)).astype(np.int32)))

    def agg(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if count:
            out = df.groupby(key_cols, as_index=False, sort=False).size().rename(columns={"size": out_col})
        else:
            out = df.groupby(key_cols, as_index=False, sort=False)[val_col].sum().rename(
                columns={val_col: out_col}
            )
        out_t = pa.int64() if count else t.schema.field(val_col).type
        return pa.Table.from_pandas(
            out,
            schema=pa.schema(
                [(c, t.schema.field(c).type) for c in key_cols] + [(out_col, out_t)]
            ),
            preserve_index=False,
        )

    slim = shuffle_coalesce(ds.map_batches(add_pb, batch_format="pyarrow"))
    out = slim.groupby("__pb").map_groups(agg, batch_format="pyarrow")
    tmap = _schema_types(slim, ds)
    if tmap is None:
        return out
    return _seed_empty(
        out,
        [(c, tmap[c]) for c in key_cols]
        + [(out_col, pa.int64() if count else tmap[val_col])],
    )


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    num_buckets: int = 32,
    how: str = "inner",
    right_on: Optional[str] = None,
) -> "ray.data.Dataset":
    """Partitioned hash join on a key column (explicit shuffle-once plan).

    Non-key column names of the two sides must be disjoint (rename
    upstream).  ``how`` ∈ {inner, left, outer}; outer with ``on ==
    right_on`` coalesces the key column across sides (pandas merge
    semantics in every bucket).
    """
    if how not in ("inner", "left", "outer"):
        raise ValueError(f"how must be inner/left/outer, got {how!r}")
    right_on = right_on or on
    l_schema, r_schema = left.schema(), right.schema()
    if l_schema is None or r_schema is None:
        raise ValueError(
            "hash_join input has no schema (all-empty dataset whose blocks "
            "were dropped) — seed it with a schema-pinned empty block "
            "(_seed_empty) so the join can build its output schema"
        )
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    l_types = {n: _arrow_type(t) for n, t in zip(l_schema.names, l_schema.types)}
    r_types = {n: _arrow_type(t) for n, t in zip(r_schema.names, r_schema.types)}
    overlap = (set(l_cols) & set(r_cols)) - ({on} if on == right_on else set())
    if overlap:
        raise ValueError(f"hash_join: overlapping non-key columns {overlap}")

    def tag(side: str, key: str, own_cols, other_cols, other_types):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            b = _key_buckets(batch[key], num_buckets)
            batch = batch.append_column("__bucket", pa.array(b)).append_column(
                "__side", pa.array(np.repeat(side, n), pa.string())
            )
            for c in other_cols:  # null-pad to the union schema
                if c not in own_cols:
                    batch = batch.append_column(c, pa.nulls(n, other_types[c]))
            return batch

        return fn

    union_order = l_cols + [c for c in r_cols if c not in l_cols] + ["__bucket", "__side"]
    l = left.map_batches(tag("l", on, l_cols, r_cols, r_types), batch_format="pyarrow").map_batches(
        lambda t: t.select(union_order), batch_format="pyarrow"
    )
    r = right.map_batches(tag("r", right_on, r_cols, l_cols, l_types), batch_format="pyarrow").map_batches(
        lambda t: t.select(union_order), batch_format="pyarrow"
    )
    both = shuffle_coalesce(l.union(r))

    lk = list(dict.fromkeys(l_cols))
    rk = list(dict.fromkeys(r_cols))

    def _pin_schema(m: "pd.DataFrame") -> pa.Table:
        if how != "inner":
            # unmatched right columns arrive as float NaN; restore nullable
            # ints so the output schema matches the inner-join groups
            for c in m.columns:
                t_arrow = r_types.get(c, l_types.get(c))
                if t_arrow is not None and pa.types.is_integer(t_arrow) and m[c].dtype.kind == "f":
                    m[c] = m[c].astype("Int64")
        # pin the Arrow schema: a group whose rows are all one side yields
        # all-NaN object columns that from_pandas would otherwise infer as
        # null-typed — unstable block schemas downstream (cf. asof.py fix)
        schema = pa.schema(
            [(c, l_types[c] if c in l_types else r_types[c]) for c in m.columns]
        )
        return pa.Table.from_pandas(m, preserve_index=False, schema=schema)

    def merge(group: pa.Table) -> pa.Table:
        # Operate on the ARROW group and only convert each side to pandas
        # AFTER selecting its own columns: the union's null-padding would
        # otherwise promote every int column to float64 in a whole-group
        # pandas frame — silently corrupting int keys > 2^53 and hashing
        # chained-join keys inconsistently (int modulo path vs float
        # object-hash path), which drops matches.
        mask = pc.equal(group["__side"], "l")
        lg = group.filter(mask).select(lk).to_pandas()
        rg = group.filter(pc.invert(mask)).select(rk).to_pandas()
        # merge on empty inputs still yields the full merged column set
        # with dtypes — never a column-less frame (schema stability)
        m = lg.merge(rg, left_on=on, right_on=right_on, how=how)
        return _pin_schema(m)

    joined = both.groupby("__bucket").map_groups(merge, batch_format="pyarrow")

    # Seed the output with a schema-pinned EMPTY block: when every group's
    # merge is empty Ray drops the empty blocks entirely and the dataset
    # loses its schema (to_pandas → a column-less (0,0) frame).  The seed
    # block is produced by the exact same empty-frame merge + schema pin,
    # so it is always schema-identical to the live groups and costs one
    # zero-row block.
    empty_l = pa.table({c: pa.array([], type=l_types[c]) for c in lk}).to_pandas()
    empty_r = pa.table({c: pa.array([], type=r_types[c]) for c in rk}).to_pandas()
    seed = _pin_schema(empty_l.merge(empty_r, left_on=on, right_on=right_on, how=how))
    return ray.data.from_arrow(seed).union(joined)
