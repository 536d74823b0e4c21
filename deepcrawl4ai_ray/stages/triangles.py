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
    from .join import bloom_semi_anti, hash_join, shuffle_coalesce

    und, deg = _und_deg_pair if _und_deg_pair is not None else _und_deg(edges_ds, src, dst)

    # attach order keys to both endpoints, then orient low -> high
    j1 = hash_join(und, deg, on="a", right_on="node", how="inner").map_batches(
        lambda t: pa.table({"a": t["a"], "b": t["b"], "deg_a": t["deg"]}),
        batch_format="pyarrow",
    )
    j2 = hash_join(j1, deg, on="b", right_on="node", how="inner").map_batches(
        lambda t: pa.table(
            {"a": t["a"], "b": t["b"], "deg_a": t["deg_a"], "deg_b": t["deg"]}
        ),
        batch_format="pyarrow",
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
        df = t.to_pandas().sort_values(["u", "dv", "v"], kind="mergesort")
        xs: list = []
        ys: list = []
        zs: list = []
        for _, grp in df.groupby("u", sort=False):
            vs = grp["v"].tolist()
            n = len(vs)
            if n < 2:
                continue
            x = grp["u"].iloc[0]
            for i in range(n - 1):
                vi = vs[i]
                for j in range(i + 1, n):
                    xs.append(x)
                    ys.append(vi)
                    zs.append(vs[j])
        return pa.table(
            {
                "x": pa.array(xs, pa.string()),
                "y": pa.array(ys, pa.string()),
                "z": pa.array(zs, pa.string()),
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
    tri = bloom_semi_anti(keyed, "k", keys, "k", keep_in=True)
    return tri.map_batches(lambda t: t.select(["x", "y", "z"]), batch_format="pyarrow")


def triangle_corner_hosts(edges_ds, src: str = "src", dst: str = "dst"):
    """Per-host triangle-corner counts (each triangle contributes its
    three corners): pandas (host, n_corners) sorted by host — the skew /
    community-density signal next to link_degree_stats.  Also carries
    the global invariant sum(n_corners) == 3 * triangle count."""
    from ..functions.urlnorm import host_of
    from .agg import partial_grouped_sum

    tri = triangle_corners(edges_ds, src, dst)

    def corners(t: pa.Table) -> pa.Table:
        flat = pa.concat_arrays(
            [t[c].combine_chunks().cast(pa.string()) for c in ("x", "y", "z")]
        )
        hosts = [host_of(u) for u in flat.to_pylist()]
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

    Returns pandas (node, degree:int64, n_triangles:int64, cc:float64)
    sorted by node.
    """
    from .join import bucketed_sum, hash_join

    pair = _und_deg(edges_ds, src, dst)
    deg = pair[1]
    tri = triangle_corners(edges_ds, src, dst, _und_deg_pair=pair)

    def corners(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t[c].combine_chunks().cast(pa.string()) for c in ("x", "y", "z")]
        )})

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": pd.Series(dtype="object"),
                "degree": pd.Series(dtype="int64"),
                "n_triangles": pd.Series(dtype="int64"),
                "cc": pd.Series(dtype="float64"),
            }
        )

    tcount = bucketed_sum(
        tri.map_batches(corners, batch_format="pyarrow"), ["node"], "node", "n_tri", count=True
    )
    if tcount.schema() is None:  # triangle-free graph: all corner blocks empty
        return _empty()
    j = hash_join(tcount, deg, on="node", how="inner").to_pandas()
    if j.empty:
        return _empty()
    j["degree"] = j["deg"].astype("int64")
    j["n_triangles"] = j["n_tri"].astype("int64")
    j["cc"] = 2.0 * j["n_triangles"] / (j["degree"] * (j["degree"] - 1.0))
    return (
        j[["node", "degree", "n_triangles", "cc"]]
        .sort_values("node")
        .reset_index(drop=True)
    )
