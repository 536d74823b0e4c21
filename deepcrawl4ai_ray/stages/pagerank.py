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
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .join import bucketed_distinct, bucketed_sum, hash_join


#: rank_mode="auto" broadcasts the per-round rank table when the node
#: count is at most this (strings + floats ≈ 100 B/node → ≤ ~400 MB on
#: the driver / object store — trivial next to what one join-mode round
#: shuffles); beyond it, the per-round hash_join path runs.  Raised from
#: 2M in r4: the 2.1M-node sf1 proof graph sat just past the old guard
#: and paid 750 s of join rounds where broadcast does it in ~40 s.
_BROADCAST_MAX_NODES = 4_000_000


def pagerank(
    edges: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    num_buckets: int = 32,
    rank_mode: str = "auto",
) -> "ray.data.Dataset":
    """PageRank with uniform teleport and dangling-mass redistribution
    over the DISTINCT edge set → Dataset(node, pr), Σpr = 1.

    Node set = every url appearing as src or dst.  ``iters`` power
    iterations of  pr(v) = (1−d)/N + d·(Σ_{u→v} pr(u)/deg(u) + D/N)
    where D is the total rank of dangling nodes.

    ``rank_mode``: "join" is the 10^10-edge shape documented above (the
    rank table is itself too big to hold anywhere — one hash_join + one
    groupby per round).  "broadcast" exploits the common mid-size case
    (rank table ≤ _BROADCAST_MAX_NODES, edge table still arbitrarily
    large): node urls map once to int positions, edges dedup on one
    packed-int key (no string sort), and each round is a shuffle-FREE
    map pass emitting per-block dense ``np.bincount`` contribution
    vectors that sum on the driver (≤ 8·N bytes per block by the
    guard) — identical math (same share/Sum/base formula; equality
    property-tested).  "auto" counts nodes once and picks.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if rank_mode not in ("join", "broadcast", "auto"):
        raise ValueError(f"unknown rank_mode {rank_mode!r}")

    # the raw edge table is consumed twice (node set, then position
    # mapping / distinct) — materialize once so an upstream extraction
    # pipeline doesn't re-execute per consumer
    edges = edges.materialize()

    node_arr, nodes = _node_set(edges, src, dst, want_driver=rank_mode != "join")
    n_nodes = len(node_arr) if node_arr is not None else nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "pr": pa.array([], pa.float64())})
        )

    if rank_mode == "auto":
        rank_mode = "broadcast" if n_nodes <= _BROADCAST_MAX_NODES else "join"
    if rank_mode == "broadcast":
        if node_arr is None:  # rare: raw-cap overflow but few distinct nodes
            node_arr = pa.array(nodes.to_pandas()["node"], pa.string())
        return _pagerank_broadcast(edges, node_arr, n_nodes, src, dst, iters, damping)
    if nodes is None:
        nodes = ray.data.from_arrow(pa.table({"node": node_arr})).repartition(4)

    # distinct edges, once (multi-links from one page count once) — and
    # per-src out-degrees: both via the two-level bucket shape (Ray's
    # per-DISTINCT-key aggregates pay O(groups) state, BASELINE.md r4)
    edges_d = bucketed_distinct(edges, [src, dst], num_buckets=num_buckets).materialize()
    outdeg = bucketed_sum(edges_d, [src], "", "deg", num_buckets=num_buckets, count=True)

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

    dst_nodes = bucketed_distinct(edges_d, [dst], num_buckets=num_buckets).map_batches(
        lambda t: t.rename_columns(["node"]), batch_format="pyarrow"
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
        )
        contrib = (
            bucketed_sum(contrib, [dst], "share", "in_pr", num_buckets=num_buckets)
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


#: driver-side node-set collection compacts (pc.unique fold) every this
#: many buffered raw strings — bounds driver heap at ~distinct + window.
_NODE_COMPACT_RAW = 4_000_000

#: ...and aborts to the distributed path once the COMPACTED distinct
#: count exceeds this (such graphs exceed the broadcast guard anyway).
_NODE_RAW_CAP = 2 * _BROADCAST_MAX_NODES


def _node_set(
    edges: "ray.data.Dataset", src: str, dst: str, want_driver: bool
) -> tuple["pa.Array | None", "ray.data.Dataset | None"]:
    """Distinct node set of the edge table → (node_arr, nodes_dataset),
    exactly one of which is None.

    Fast path (``want_driver``): per-block unique strings stream to the
    driver with INCREMENTAL pc.unique compaction (fold every
    _NODE_COMPACT_RAW raw strings; abort to the distributed path once
    the compacted distinct count passes _NODE_RAW_CAP) — no string-sort
    shuffle at all, driver heap bounded by distinct + one window.
    Broadcast-mode pagerank pulls the node table to the driver anyway,
    so this merely moves that pull BEFORE the groupby it replaces
    (206k-node bench gate: 13.0 s → 0.6 s).  Overflow or
    ``want_driver=False`` falls back to the distributed
    per-block-unique + groupby shape."""

    def _both(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [t[src].combine_chunks().cast(pa.string()), t[dst].combine_chunks().cast(pa.string())]
        )
        return pa.table({"node": pc.unique(both)})

    parts = edges.map_batches(_both, batch_format="pyarrow")
    if want_driver:
        # Incremental compaction: fold pc.unique every _NODE_COMPACT_RAW
        # raw strings so driver heap is bounded by distinct + one window
        # (the naive collect-then-unique held ~1 GB of raw per-block
        # chunks at the 2.1M-node sf1 proof).  Stays an ARROW array end
        # to end — a numpy object array would materialize N python str
        # objects (~100 B each) that the broadcast path never needs.
        chunks: list = []
        total = 0
        overflow = False
        for b in parts.iter_batches(batch_format="pyarrow"):
            chunks.append(b["node"].combine_chunks())
            total += len(chunks[-1])
            if total > _NODE_COMPACT_RAW:
                u = pc.unique(pa.concat_arrays(chunks))
                chunks, total = [u], len(u)
                if total > _NODE_RAW_CAP:
                    overflow = True  # huge distinct set: broadcast won't
                    break  # be used; build the node table distributed
        if not overflow:
            u = pc.unique(pa.concat_arrays(chunks)) if chunks else pa.array([], pa.string())
            u = u.take(pc.sort_indices(u))
            return u, None

    nodes = (
        bucketed_distinct(parts, ["node"], num_buckets=64)
        .repartition(4)
        .materialize()
    )
    return None, nodes


def _node_pos_map(node_arr: "pa.Array") -> "tuple[np.ndarray, np.ndarray] | None":
    """64-bit hash → node-position map for :func:`_edges_to_packed`:
    (hsorted, order) such that ``order[searchsorted(hsorted, hash(url))]``
    is the url's index in ``node_arr``.  ``pd.util.hash_array`` is a
    keyed siphash — deterministic across processes, no PYTHONHASHSEED.
    Returns None when two nodes collide in 64 bits (probability ~1e-7 at
    the 4M-node broadcast guard; the caller then falls back to exact
    ``pc.index_in``).  Hashing is chunked so the driver materializes at
    most 256k Python strings at a time."""
    import pandas as pd

    n = len(node_arr)
    hs = []
    for lo in range(0, n, 262_144):
        sl = node_arr.slice(lo, 262_144)
        hs.append(pd.util.hash_array(np.asarray(sl.to_pandas(), dtype=object)))
    h = np.concatenate(hs) if hs else np.array([], dtype=np.uint64)
    if len(np.unique(h)) != n:
        return None
    order = np.argsort(h, kind="stable").astype(np.int64)
    return h[order], order


def _edges_to_packed(
    edges: "ray.data.Dataset", node_arr: "pa.Array", src: str, dst: str
) -> "ray.data.Dataset":
    """Map a RAW string edge table onto int node positions and dedup it
    → materialized Dataset of packed uint64 keys (src_pos<<32|dst_pos).
    The distinct step runs on the packed INT key — per-block np.unique
    combiner, a repartition that collapses the many tiny 8 B/edge key
    blocks, then one int groupby — instead of a string-pair sort
    (measured 12.7 s → ~2 s at 1.15M bench edges).  Node count is
    bounded by the caller's broadcast guard, so positions fit 32 bits.

    Position lookup broadcasts a 16 B/node (hash, position) map and does
    a vectorized hash + searchsorted per batch — ``pc.index_in`` against
    the broadcast STRING array re-built its 2.1M-entry hash table on
    every batch (sf1 proof: 36 s → 2.2 s for this map pass); the string
    path remains as the exact fallback for a 64-bit node-hash collision."""
    from .join import cached_get, shuffle_coalesce

    pos_map = _node_pos_map(node_arr)

    if pos_map is not None:
        pm_ref = ray.put(pos_map)

        def to_key(t: pa.Table) -> pa.Table:
            import pandas as pd

            hsrt, ordr = cached_get(pm_ref, "pagerank.nodeposmap")

            def pos(col: "pa.ChunkedArray") -> np.ndarray:
                ob = col.combine_chunks().cast(pa.string()).to_numpy(zero_copy_only=False)
                hb = pd.util.hash_array(ob)
                i = np.searchsorted(hsrt, hb)
                # every edge endpoint IS a node (the node set derives
                # from this same edge table) — guard anyway so a misuse
                # raises here, not as silent rank corruption
                if len(i) and (i[-1] >= len(hsrt) or not np.array_equal(hsrt[i], hb)):
                    raise ValueError("edge endpoint missing from node set")
                return ordr[i].astype(np.uint64)

            key = np.unique((pos(t[src]) << np.uint64(32)) | pos(t[dst]))
            return pa.table(
                {
                    "ek": pa.array(key, pa.uint64()),
                    # partition on the src position so the global dedup
                    # is a 32-GROUP groupby + per-group np.unique — a
                    # groupby on the raw key would carry per-group
                    # aggregate state for E distinct groups (measured
                    # 10.2 s → 1.5 s at 1.15M bench edges)
                    "pb": pa.array(((key >> np.uint64(32)) % np.uint64(32)).astype(np.int32)),
                }
            )

    else:  # 64-bit node-hash collision: exact string index_in path
        keys_ref = ray.put(node_arr)

        def to_key(t: pa.Table) -> pa.Table:
            ks = cached_get(keys_ref, "pagerank.nodekeys")
            sp = pc.index_in(t[src].combine_chunks().cast(pa.string()), value_set=ks).to_numpy(
                zero_copy_only=False
            )
            dp = pc.index_in(t[dst].combine_chunks().cast(pa.string()), value_set=ks).to_numpy(
                zero_copy_only=False
            )
            key = np.unique((sp.astype(np.uint64) << np.uint64(32)) | dp.astype(np.uint64))
            return pa.table(
                {
                    "ek": pa.array(key, pa.uint64()),
                    "pb": pa.array(((key >> np.uint64(32)) % np.uint64(32)).astype(np.int32)),
                }
            )

    def dedup_group(t: pa.Table) -> pa.Table:
        return pa.table({"ek": pa.array(np.unique(t["ek"].to_numpy()), pa.uint64())})

    # coalesce the many tiny slim-key map blocks before the 32-group
    # all-to-all — without it the shuffle emits thousands of sub-inline-
    # threshold partition objects that land in the DRIVER's in-process
    # store (sf1 proof: groupby 17.4 s → 0.9 s, driver anon-RSS step
    # +1.18 GB → flat)
    return (
        shuffle_coalesce(edges.map_batches(to_key, batch_format="pyarrow"))
        .groupby("pb")
        .map_groups(dedup_group, batch_format="pyarrow")
        .materialize()
    )


#: Blocks-per-task fan-in of the worker-side partial-vector reduction.
_PREREDUCE_FANIN = 8


def _sum_block_vectors(parts: "ray.data.Dataset", n: int, dtype=np.float64) -> np.ndarray:
    """Sum of per-block dense length-n vectors (binary rows) → ndarray.
    Per-block partials are ≤ 8·n bytes each, bounded by the broadcast
    node guard.  Workers pre-reduce first: one coalescing map_batches
    sums _PREREDUCE_FANIN single-row blocks per task, so the driver
    deserializes ceil(B/fanin) vectors instead of B — at the sf1 proof
    (2.1M nodes, ~32 edge blocks, 4 passes) the direct driver sum pulled
    ~2 GB of partials through the driver heap and left a ~1.2 GB
    allocator high-water plateau; pre-reduction cuts driver traffic 8×."""

    def _sum_batch(t: pa.Table) -> pa.Table:
        acc = None
        for x in t["part"]:
            v = np.frombuffer(x.as_buffer(), dtype=dtype)
            acc = v.astype(dtype, copy=True) if acc is None else acc + v
        if acc is None:
            return pa.table({"part": pa.array([], pa.binary())})
        return pa.table({"part": pa.array([acc.tobytes()], pa.binary())})

    reduced = parts.map_batches(
        _sum_batch, batch_format="pyarrow", batch_size=_PREREDUCE_FANIN
    )
    acc = np.zeros(n, dtype=dtype)
    for b in reduced.iter_batches(batch_format="pyarrow"):
        for x in b["part"]:
            # as_buffer() views the (plasma-mapped) Arrow buffer —
            # as_py() would copy each 8·n-byte partial into driver heap
            acc += np.frombuffer(x.as_buffer(), dtype=dtype)
    return acc


def _pagerank_broadcast(
    edges: "ray.data.Dataset",
    node_arr: "pa.Array",
    n_nodes: int,
    src: str,
    dst: str,
    iters: int,
    damping: float,
) -> "ray.data.Dataset":
    """Broadcast-ranks power iteration (see pagerank rank_mode docs):
    urls map once to int positions (_edges_to_packed), the packed edge
    table stays distributed, and each round is a single shuffle-free map
    pass — share = pr/deg gathered per edge from the broadcast rank
    vector, np.bincount per block, dense partials summed on the driver.
    Replaces the per-round groupby(dst) STRING sort (206k-node bench
    gate: 53.8 s → ~8 s).  Same formula as the join path — share =
    pr/deg per edge, Sum per dst, base = (1−d)/N + d·D/N; mode equality
    is property-tested."""
    from .join import cached_get

    ek = _edges_to_packed(edges, node_arr, src, dst)
    mask = np.uint64(0xFFFFFFFF)

    def deg_block(t: pa.Table) -> pa.Table:
        sp = (t["ek"].to_numpy() >> np.uint64(32)).astype(np.int64)
        vec = np.bincount(sp, minlength=n_nodes).astype(np.int64)
        return pa.table({"part": pa.array([vec.tobytes()], pa.binary())})

    deg = _sum_block_vectors(
        ek.map_batches(deg_block, batch_format="pyarrow", batch_size=None), n_nodes, np.int64
    ).astype(np.float64)

    pr = np.full(n_nodes, 1.0 / n_nodes, dtype=np.float64)
    teleport = (1.0 - damping) / n_nodes

    for _ in range(iters):
        share_by_node = np.divide(pr, deg, out=np.zeros_like(pr), where=deg > 0)
        # slot cache: each round's vector EVICTS the previous round's —
        # no per-worker accumulation over iters
        ref = ray.put(share_by_node)

        def contrib_block(t: pa.Table, _ref=ref) -> pa.Table:
            share = cached_get(_ref, "pagerank.prshare")
            e = t["ek"].to_numpy()
            sp = (e >> np.uint64(32)).astype(np.int64)
            dp = (e & mask).astype(np.int64)
            vec = np.bincount(dp, weights=share[sp], minlength=n_nodes)
            return pa.table({"part": pa.array([vec.tobytes()], pa.binary())})

        in_pr = _sum_block_vectors(
            ek.map_batches(contrib_block, batch_format="pyarrow", batch_size=None), n_nodes
        )
        nd_mass = float(in_pr.sum())
        base = teleport + damping * (1.0 - nd_mass) / n_nodes
        pr = base + damping * in_pr

    return ray.data.from_arrow(
        pa.table({"node": node_arr, "pr": pa.array(pr, pa.float64())})
    )


def hits(
    edges: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
    num_buckets: int = 32,
    rank_mode: str = "auto",
) -> "ray.data.Dataset":
    """HITS hubs & authorities (Kleinberg 1999) over the DISTINCT edge
    set → Dataset(node, hub, authority), each vector L2-normalized.

    Iteration k:  a(v) = Σ_{u→v} h(u), normalize ‖a‖₂ = 1;
                  h(u) = Σ_{u→v} a(v), normalize ‖h‖₂ = 1.
    Same mode split as :func:`pagerank`: "join" = one hash_join + one
    groupby per HALF-round (the 10^10-edge shape, rank tables never
    leave the cluster); "broadcast" = per-half-round rank dict via
    ``ray.put`` + one groupby over the distributed edge table, contrib
    vector (≤ nodes, small by guard) normalized driver-side; "auto"
    picks by node count.  Fixed-iteration so the unrolled-CTE SQL
    oracle reproduces it exactly; mode equality is property-tested.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if rank_mode not in ("join", "broadcast", "auto"):
        raise ValueError(f"unknown rank_mode {rank_mode!r}")

    edges = edges.materialize()
    node_arr, nodes_ds = _node_set(edges, src, dst, want_driver=rank_mode != "join")
    n_nodes = len(node_arr) if node_arr is not None else nodes_ds.count()
    empty = pa.table(
        {
            "node": pa.array([], pa.string()),
            "hub": pa.array([], pa.float64()),
            "authority": pa.array([], pa.float64()),
        }
    )
    if n_nodes == 0:
        return ray.data.from_arrow(empty)
    if rank_mode == "auto":
        rank_mode = "broadcast" if n_nodes <= _BROADCAST_MAX_NODES else "join"
    if rank_mode == "join":
        edges_d = bucketed_distinct(edges, [src, dst], num_buckets=num_buckets).materialize()
        if nodes_ds is None:
            nodes_ds = ray.data.from_arrow(pa.table({"node": node_arr})).repartition(4)
        return _hits_join(edges_d, nodes_ds, src, dst, iters, num_buckets)

    from .join import cached_get

    if node_arr is None:  # rare: raw-cap overflow but few distinct nodes
        node_arr = pa.array(nodes_ds.to_pandas()["node"], pa.string())
    ek = _edges_to_packed(edges, node_arr, src, dst)
    mask = np.uint64(0xFFFFFFFF)
    h = np.ones(n_nodes, dtype=np.float64)
    a = np.zeros(n_nodes, dtype=np.float64)

    def _propagate(vec: np.ndarray, forward: bool, slot: str) -> np.ndarray:
        """forward: out[dst] += vec[src]; else out[src] += vec[dst] —
        shuffle-free per-block np.bincount partials over the packed int
        edge table, summed driver-side (see _pagerank_broadcast)."""
        ref = ray.put(vec)

        def contrib_block(t: pa.Table, _ref=ref, _fwd=forward) -> pa.Table:
            v = cached_get(_ref, slot)
            e = t["ek"].to_numpy()
            sp = (e >> np.uint64(32)).astype(np.int64)
            dp = (e & mask).astype(np.int64)
            src_pos, out_pos = (sp, dp) if _fwd else (dp, sp)
            part = np.bincount(out_pos, weights=v[src_pos], minlength=n_nodes)
            return pa.table({"part": pa.array([part.tobytes()], pa.binary())})

        out = _sum_block_vectors(
            ek.map_batches(contrib_block, batch_format="pyarrow", batch_size=None), n_nodes
        )
        nrm = np.sqrt(float(np.sum(out * out)))
        return out / nrm if nrm > 0 else out

    for _ in range(iters):
        a = _propagate(h, True, "hits.h")
        h = _propagate(a, False, "hits.a")

    return ray.data.from_arrow(
        pa.table(
            {
                "node": node_arr,
                "hub": pa.array(h, pa.float64()),
                "authority": pa.array(a, pa.float64()),
            }
        )
    )


def _hits_join(edges_d, nodes_ds, src, dst, iters, num_buckets):
    """Join-mode HITS: rank tables stay Datasets; each half-round is one
    bucketed hash_join (edges ⋈ ranks on the propagating endpoint) + one
    groupby(other endpoint) + a scalar sum-of-squares normalize."""

    def _const(val: float):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {"node": t["node"], "r": pa.array(np.full(len(t), val), pa.float64())}
            )

        return fn

    def _propagate(ranks, key_col, out_col):
        j = hash_join(
            edges_d,
            ranks.map_batches(
                lambda t, k=key_col: t.rename_columns(
                    [k if c == "node" else c for c in t.column_names]
                ),
                batch_format="pyarrow",
            ),
            on=key_col,
            num_buckets=num_buckets,
        )
        cont = j.map_batches(
            lambda t, o=out_col: pa.table({"node": t[o], "c": t["r"]}),
            batch_format="pyarrow",
        )
        cont = bucketed_sum(cont, ["node"], "c", "s", num_buckets=num_buckets).materialize()
        sq = cont.map_batches(
            lambda t: pa.table({"q": pc.multiply(t["s"], t["s"])}), batch_format="pyarrow"
        ).sum("q")
        nrm = float(np.sqrt(sq or 0.0))

        def norm_batch(t: pa.Table, _n=nrm) -> pa.Table:
            r = pc.divide(t["s"], pa.scalar(_n, pa.float64())) if _n > 0 else t["s"]
            return pa.table({"node": t["node"], "r": r})

        cont_n = cont.map_batches(norm_batch, batch_format="pyarrow")
        # nodes with no contribution get 0 (needed as join input next
        # half-round): left join nodes onto contributions
        filled = hash_join(
            nodes_ds, cont_n.map_batches(
                lambda t: t.rename_columns(["__n" if c == "node" else c for c in t.column_names]),
                batch_format="pyarrow",
            ),
            on="node",
            right_on="__n",
            how="left",
            num_buckets=num_buckets,
        ).map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "r": pc.coalesce(t["r"], pa.scalar(0.0, pa.float64())),
                }
            ),
            batch_format="pyarrow",
        )
        return filled.repartition(4).materialize()

    h = nodes_ds.map_batches(_const(1.0), batch_format="pyarrow").materialize()
    a = None
    for _ in range(iters):
        a = _propagate(h, src, dst)
        h = _propagate(a, dst, src)

    ha = hash_join(
        h.map_batches(
            lambda t: pa.table({"node": t["node"], "hub": t["r"]}), batch_format="pyarrow"
        ),
        a.map_batches(
            lambda t: pa.table({"__n": t["node"], "authority": t["r"]}), batch_format="pyarrow"
        ),
        on="node",
        right_on="__n",
        num_buckets=num_buckets,
    )
    return ha.select_columns(["node", "hub", "authority"])
