"""Triangle counting over the link graph — degree-ordered orientation
(Schank & Wagner 2005; the MapReduce formulation of Suri &
Vassilvitskii 2011), the missing member of the graph family next to
degree stats, PageRank/HITS and connected components.

Why orientation matters at 10^10 edges: the naive node-iterator emits
one wedge per neighbor PAIR of every node — a hot host with 10^6
inlinks alone contributes 5·10^11 wedges.  Orienting every edge from
its (degree, id)-smaller endpoint caps each node's oriented out-degree
at O(sqrt(m)), bounding total wedges by O(m^{3/2}) and, more
importantly, bounding the hot node: its 10^6 undirected neighbors
become inbound edges owned by the low-degree side.

Plan (all slim (node, node) string rows — never payloads):
  1. canonical undirected edges (min, max), distinct, self-loops dropped
  2. degree per node (two-level bucketed count)
  3. two hash joins attach (deg, id) order keys; each edge orients
     low → high
  4. wedge generation per source node inside hash buckets (the
     two-level shape: groupby(bucket) → in-bucket pandas groupby, so
     per-DISTINCT-node aggregate state never hits Ray's operator)
  5. a wedge (x; y, z) is a triangle iff oriented edge (y, z) exists:
     EXACT map-side bloom semi-join of wedges against the edge keys
     (join.bloom_semi_anti — the J4 machinery; bloom-negative wedges
     drop in place, only the FP minority pays the verify join)

Each triangle is found exactly once (its (deg,id)-minimal corner owns
the wedge).  Output: per-triangle corner rows, for any downstream
rollup (per-host counts, clustering coefficients).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

_SEP = "\x1f"  # never appears in normalized URLs/hosts


def _canonical_edges(edges_ds, src: str, dst: str):
    """DISTINCT undirected (a, b) with a < b, self-loops dropped.  Node
    ids are cast to string up front so the downstream degree join and
    wedge keys are type-stable for any input id type (an int64 edge
    table would otherwise silently match nothing against the
    string-typed degree table)."""
    from .join import bucketed_distinct

    def canon(t: pa.Table) -> pa.Table:
        s = t[src].combine_chunks().cast(pa.string())
        d = t[dst].combine_chunks().cast(pa.string())
        a = pc.min_element_wise(s, d)
        b = pc.max_element_wise(s, d)
        tbl = pa.table({"a": a, "b": b})
        return tbl.filter(pc.not_equal(tbl["a"], tbl["b"]))

    return bucketed_distinct(edges_ds.map_batches(canon, batch_format="pyarrow"), ["a", "b"])


def _und_deg(edges_ds, src: str, dst: str):
    """(undirected edges, degree table), both MATERIALIZED — each is
    consumed by more than one downstream branch, and Ray does not cache
    shared un-materialized lineage (the edge extraction + distinct +
    degree shuffles would re-execute per consumer)."""
    from .join import bucketed_sum

    und = _canonical_edges(edges_ds, src, dst).materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t["a"].combine_chunks(), t["b"].combine_chunks()]
        )})

    deg = bucketed_sum(
        und.map_batches(endpoints, batch_format="pyarrow"), ["node"], "node", "deg", count=True
    ).materialize()
    return und, deg


def triangle_corners(edges_ds, src: str = "src", dst: str = "dst", _und_deg_pair=None):
    """Dataset of one row per triangle: (x, y, z) corner node ids in
    (degree, id) orientation order.  See module docstring for the plan.
    """
    from .join import (
        _MAX_LOOKUP_BROADCAST_ROWS,
        bloom_semi_anti,
        broadcast_lookup_table,
        lookup_join,
        shuffle_coalesce,
    )

    und, deg = _und_deg_pair if _und_deg_pair is not None else _und_deg(edges_ds, src, dst)

    # attach order keys to both endpoints, then orient low -> high; the
    # degree table is unique-keyed so lookup_join applies: broadcast
    # index_in when it fits (zero shuffle; collected + put ONCE and
    # shared by both attachments), bucketed hash_join at 10^10-node scale
    deg_ref = (
        broadcast_lookup_table(deg)
        if deg.count() <= _MAX_LOOKUP_BROADCAST_ROWS
        else None
    )
    j1 = lookup_join(
        und, deg, on="a", right_on="node", rename={"deg": "deg_a"}, right_ref=deg_ref
    )
    j2 = lookup_join(
        j1, deg, on="b", right_on="node", rename={"deg": "deg_b"}, right_ref=deg_ref
    )

    def orient(t: pa.Table) -> pa.Table:
        da = t["deg_a"].to_numpy(zero_copy_only=False)
        db = t["deg_b"].to_numpy(zero_copy_only=False)
        a = np.asarray(t["a"].to_pylist(), dtype=object)
        b = np.asarray(t["b"].to_pylist(), dtype=object)
        # a < b lexicographically already, so deg ties break to a (= by id)
        a_first = da <= db
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        dv = np.where(a_first, db, da).astype(np.int64)
        return pa.table(
            {
                "u": pa.array(u, pa.string()),
                "v": pa.array(v, pa.string()),
                "dv": pa.array(dv, pa.int64()),
            }
        )

    # materialized: consumed by BOTH wedge generation and the edge-key
    # side of the semi-join — without this the distinct/degree/joins
    # pipeline above executes twice (measured ~2x at sf1)
    oriented = j2.map_batches(orient, batch_format="pyarrow").materialize()

    # wedge generation, two-level: bucket by source node, pandas inside
    def add_pb(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(np.asarray(t["u"].to_pylist(), dtype=object), categorize=False)
        return t.append_column("__pb", pa.array((h % np.uint64(64)).astype(np.int32)))

    def wedges(t: pa.Table) -> pa.Table:
        """All C(d,2) neighbor pairs per source node, fully vectorized —
        the np.repeat + offset-arithmetic pair expansion (the
        stages/dupspans.py / stages/pack.py pattern): sort by
        (u, dv, v) so each wedge (y, z) comes out in oriented-edge order,
        repeat element i of a d-sized group (d-1-i) times for the y
        side, and close the z side with a per-repeat running offset."""
        empty = pa.table(
            {
                "x": pa.array([], pa.string()),
                "y": pa.array([], pa.string()),
                "z": pa.array([], pa.string()),
            }
        )
        if t.num_rows == 0:
            return empty
        u = np.asarray(t["u"].to_pylist(), dtype=object)
        v = np.asarray(t["v"].to_pylist(), dtype=object)
        dv = t["dv"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, dv, u))  # primary u, then dv, then v
        u = u[order]
        v = v[order]
        new = np.empty(len(u), dtype=bool)
        new[0] = True
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(u)))
        gid = np.cumsum(new) - 1
        pos = np.arange(len(u)) - starts[gid]
        reps = counts[gid] - 1 - pos  # pairs each element opens as y
        total = int(reps.sum())
        if total == 0:
            return empty
        y_idx = np.repeat(np.arange(len(u)), reps)
        off = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps) + 1
        z_idx = y_idx + off
        return pa.table(
            {
                "x": pa.array(u[y_idx], pa.string()),
                "y": pa.array(v[y_idx], pa.string()),
                "z": pa.array(v[z_idx], pa.string()),
            }
        )

    from .join import _seed_empty

    wedge_ds = (
        shuffle_coalesce(oriented.map_batches(add_pb, batch_format="pyarrow"))
        .groupby("__pb")
        .map_groups(wedges, batch_format="pyarrow")
    )

    def wedge_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(t["y"], t["z"], _SEP)
        return t.append_column("k", k)

    def edge_key(t: pa.Table) -> pa.Table:
        return pa.table({"k": pc.binary_join_element_wise(t["u"], t["v"], _SEP)})

    keys = oriented.map_batches(edge_key, batch_format="pyarrow")
    # seed AFTER the last map: a triangle-free graph yields all-empty
    # wedge blocks, which Ray drops — the semi-join needs a schema
    keyed = _seed_empty(
        wedge_ds.map_batches(wedge_key, batch_format="pyarrow"),
        [("x", pa.string()), ("y", pa.string()), ("z", pa.string()), ("k", pa.string())],
    )
    # closure: wedge (x; y, z) is a triangle iff oriented edge (y, z)
    # exists.  Guarded: a small edge set ships ONCE as an exact broadcast
    # value set (is_in per wedge batch, zero shuffle); past the budget,
    # the bloom-prescreened exact semi-join (the 10^10-edge path)
    from .join import broadcast_filter

    n_edges = oriented.count()  # free: oriented is materialized
    if n_edges == 0:
        tri = keyed.limit(0)
    elif n_edges <= _MAX_LOOKUP_BROADCAST_ROWS:
        parts = [t for t in ray.get(keys.to_arrow_refs()) if t.num_columns > 0]
        key_list = (
            pa.concat_tables(parts)["k"].combine_chunks().to_pylist() if parts else []
        )
        # no driver-side sorted(): broadcast_filter's per-worker
        # pa.array(sorted(...)) normalizes anyway (r5 review)
        tri = broadcast_filter(keyed, "k", ray.put(key_list), keep_in=True)
    else:
        tri = bloom_semi_anti(keyed, "k", keys, "k", keep_in=True)
    return tri.map_batches(lambda t: t.select(["x", "y", "z"]), batch_format="pyarrow")


def triangle_corner_hosts(edges_ds, src: str = "src", dst: str = "dst"):
    """Per-host triangle-corner counts (each triangle contributes its
    three corners): pandas (host, n_corners) sorted by host — the skew /
    community-density signal next to link_degree_stats.  Also carries
    the global invariant sum(n_corners) == 3 * triangle count."""
    from ..functions.urlnorm import hosts_of
    from .agg import partial_grouped_sum

    tri = triangle_corners(edges_ds, src, dst)

    def corners(t: pa.Table) -> pa.Table:
        flat = pa.concat_arrays(
            [t[c].combine_chunks().cast(pa.string()) for c in ("x", "y", "z")]
        )
        hosts = hosts_of(flat.to_pylist())
        return pa.table({"host": pa.array(hosts, pa.string())})

    out = partial_grouped_sum(
        tri.map_batches(corners, batch_format="pyarrow"), ["host"], count_alias="n_corners"
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"host": pd.Series(dtype="object"), "n_corners": pd.Series(dtype="int64")}
        )
    out["n_corners"] = out["n_corners"].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


def local_clustering(edges_ds, src: str = "src", dst: str = "dst"):
    """Per-node local clustering coefficient c_v = 2*T_v / (d_v*(d_v-1))
    (Watts & Strogatz 1998) for every node in at least one triangle —
    degrees and triangle-corner counts are both slim groupby products of
    the machinery above; the division is one IEEE double op on exact
    ints, so the SQL twin reproduces it bit-for-bit.

    Returns a Dataset of (node:string, degree:int64, n_triangles:int64,
    cc:float64) — at web-graph scale the per-node rows stay distributed;
    callers sort/limit/aggregate or convert to pandas only at the
    contract edge.  Empty (triangle-free) inputs yield an empty Dataset
    whose ``schema()`` is this exact schema (bucketed_sum / hash_join /
    the final seed pin it); note Ray's ``to_pandas()`` on a fully-empty
    map_groups lineage can still produce a column-less frame (empty
    blocks bypass every UDF), so pandas contract edges must rebuild the
    typed empty frame — see pipelines/queries.link_clustering.
    """
    from .join import _seed_empty, bucketed_sum, lookup_join

    pair = _und_deg(edges_ds, src, dst)
    deg = pair[1]
    tri = triangle_corners(edges_ds, src, dst, _und_deg_pair=pair)

    def corners(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t[c].combine_chunks().cast(pa.string()) for c in ("x", "y", "z")]
        )})

    # seed: a triangle-free graph leaves every corner block empty, and
    # bucketed_sum over an all-empty input yields a schema-less Dataset
    # that the join below cannot consume
    tcount = _seed_empty(
        bucketed_sum(
            tri.map_batches(corners, batch_format="pyarrow"),
            ["node"],
            "node",
            "n_tri",
            count=True,
        ),
        [("node", pa.string()), ("n_tri", pa.int64())],
    )

    def finish(t: pa.Table) -> pa.Table:
        d = t["deg"].cast(pa.int64())
        n = t["n_tri"].cast(pa.int64())
        df = d.cast(pa.float64())
        cc = pc.divide(
            pc.multiply(pa.scalar(2.0), n.cast(pa.float64())),
            pc.multiply(df, pc.subtract(df, pa.scalar(1.0))),
        )
        return pa.table(
            {"node": t["node"], "degree": d, "n_triangles": n, "cc": cc}
        )

    return _seed_empty(
        lookup_join(tcount, deg, on="node").map_batches(
            finish, batch_format="pyarrow"
        ),
        [
            ("node", pa.string()),
            ("degree", pa.int64()),
            ("n_triangles", pa.int64()),
            ("cc", pa.float64()),
        ],
    )
