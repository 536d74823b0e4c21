"""PageRank over an edge Dataset — the canonical web-graph ranking a
crawl pipeline feeds (the reference crawls and extracts links,
tasks.py / actions.py, but has no graph analytics; this extends the
crawl family with the ranking step a 100-TB link corpus exists for).

Distributed shape (the one that holds at 10^10 edges):

- the edge table is the ONLY large dataset; it is deduped once and
  joined with out-degrees once, up front (``edges_w`` — partitioned by
  src through the bucketed hash_join, reused every round).
- each iteration is: one hash_join of the slim (node, pr) rank table
  onto ``edges_w`` by src, a vectorized share = pr/deg, and one
  groupby(dst).sum — i.e. rank mass moves along edges with exactly one
  shuffle of the rank-sized table per round; edge payloads never
  re-shuffle.
- dangling mass (nodes with no out-links) is a per-round SCALAR:
  1 − Σ(shares) — PageRank preserves total mass, so the driver holds
  one float, never a node list.
- ranks are ``materialize()``d per round to cut streaming-executor
  lineage (same discipline as stages/dedup connected components).

Convergence is fixed-iteration (``iters``) rather than epsilon-tested so
the computation is exactly reproducible by the unrolled-CTE SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from .join import hash_join


def pagerank(
    edges: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """PageRank with uniform teleport and dangling-mass redistribution
    over the DISTINCT edge set → Dataset(node, pr), Σpr = 1.

    Node set = every url appearing as src or dst.  ``iters`` power
    iterations of  pr(v) = (1−d)/N + d·(Σ_{u→v} pr(u)/deg(u) + D/N)
    where D is the total rank of dangling nodes.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")

    # distinct edges, once (multi-links from one page count once)
    edges_d = (
        edges.groupby([src, dst])
        .aggregate(Count(alias_name="__c"))
        .select_columns([src, dst])
        .materialize()
    )
    outdeg = edges_d.groupby(src).aggregate(Count(alias_name="deg"))

    def _as_node(col: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({"node": t[col]})

        return fn

    nodes = (
        edges_d.map_batches(_as_node(src), batch_format="pyarrow")
        .union(edges_d.map_batches(_as_node(dst), batch_format="pyarrow"))
        .groupby("node")
        .aggregate(Count(alias_name="__c"))
        .select_columns(["node"])
        .repartition(4)
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "pr": pa.array([], pa.float64())})
        )

    # (src, dst, deg): built once, re-joined every round by the same key
    edges_w = (
        hash_join(edges_d, outdeg, on=src, num_buckets=num_buckets)
        .repartition(max(4, num_buckets // 2))
        .materialize()
    )

    init = 1.0 / n_nodes

    def _init_pr(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["node"], "pr": pa.array(np.full(len(t), init), pa.float64())}
        )

    ranks = nodes.map_batches(_init_pr, batch_format="pyarrow").materialize()

    def _rename(frm: str, to: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns([to if c == frm else c for c in t.column_names])

        return fn

    def _share(t: pa.Table) -> pa.Table:
        sh = pc.divide(t["pr"], pc.cast(t["deg"], pa.float64()))
        return pa.table({dst: t[dst], "share": sh})

    # Every distinct dst has >= 1 in-edge, so each round's contrib table
    # covers exactly distinct(dst); the nodes that need the no-inlink
    # base rank are the FIXED set src-only nodes — computed once, not
    # re-joined every round (halves the per-round join count).
    def _mark(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["node"], "__in": pa.array(np.ones(len(t), dtype=np.int8))}
        )

    dst_nodes = (
        edges_d.map_batches(_as_node(dst), batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="__c"))
        .select_columns(["node"])
    )
    no_in = (
        hash_join(
            nodes,
            dst_nodes.map_batches(_mark, batch_format="pyarrow"),
            on="node",
            how="left",
            num_buckets=num_buckets,
        )
        .map_batches(
            lambda t: t.filter(pc.is_null(t["__in"])).select(["node"]),
            batch_format="pyarrow",
        )
        .repartition(4)
        .materialize()
    )

    teleport = (1.0 - damping) / n_nodes
    for _ in range(iters):
        contrib = (
            hash_join(
                edges_w,
                ranks.map_batches(_rename("node", src), batch_format="pyarrow"),
                on=src,
                num_buckets=num_buckets,
            )
            .map_batches(_share, batch_format="pyarrow")
            .groupby(dst)
            .aggregate(Sum("share", alias_name="in_pr"))
            .repartition(4)
            .materialize()
        )
        nd_mass = contrib.sum("in_pr") or 0.0
        base = teleport + damping * (1.0 - nd_mass) / n_nodes

        def _apply_in(t: pa.Table, _base=base) -> pa.Table:
            pr = pc.add(
                pc.multiply(t["in_pr"], pa.scalar(damping, pa.float64())), _base
            )
            return pa.table({"node": t[dst], "pr": pr})

        def _apply_base(t: pa.Table, _base=base) -> pa.Table:
            return pa.table(
                {"node": t["node"], "pr": pa.array(np.full(len(t), _base), pa.float64())}
            )

        ranks = (
            contrib.map_batches(_apply_in, batch_format="pyarrow")
            .union(no_in.map_batches(_apply_base, batch_format="pyarrow"))
            .repartition(4)
            .materialize()
        )
    return ranks
