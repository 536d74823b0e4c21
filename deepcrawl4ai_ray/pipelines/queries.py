"""Generic operator pipelines over the driver testdata tables.

One entry per operator family from SURVEY.md §2 (plus the
training-data-pipeline extensions), each expressed Ray-Data-first and —
where SQL-expressible — paired with an exactly-matching DuckDB oracle in
``ORACLES`` (same column names, same rounding, same ordering, per the
driver contract in __ray_entry__.py).

Float policy: every float aggregate is ROUNDed (2–4 dp) on BOTH sides
so summation-order differences between Ray partials and DuckDB stay
below the rounding grain.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

from ..functions import hashing as H
from ..functions.urlnorm import normalize_url, url_to_slug
from ..stages.agg import partial_grouped_sum
from ..stages.dedup import (
    exact_dedup_stats,
    minhash_lsh_pairs,
    simhash_stage,
    srp_near_dup_pairs,
)
from ..stages.join import bloom_semi_anti, broadcast_filter, hash_join
from ..stages.knn import brute_force_topk, ivf_topk, train_ivf_centroids
from ..stages.multimodal import (
    AudioFeatureStage,
    FrameSampleStage,
    ImageDecodeStage,
    ImageResizeStage,
)
from ..stages.windows import ready_queue, session_counts, tumbling_window_agg


def _p(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


def _read(sf_dir: str, table: str, columns=None, **kw) -> "rd.Dataset":
    """read_parquet with block count scaled to FILE SIZE (~4 MiB of
    parquet per block, min 4 blocks) instead of Ray's CPU-count default:
    small-sf tables otherwise shatter into 60+ sub-100-row blocks whose
    per-task overhead dominates the pipeline (observed via ds.stats():
    1.8k rows/s actual vs 110k rows/s estimated single-node).  Scales
    naturally — a 100 GB table still gets ~25k blocks."""
    import os as _os

    path = _p(sf_dir, table)
    try:
        kw.setdefault("override_num_blocks", int(max(4, _os.path.getsize(path) // (4 << 20) + 1)))
    except OSError:
        pass
    return rd.read_parquet(path, columns=columns, **kw)


# =========================================================================
# A. Aggregations (A1-A5) — TPC-H Q1 shape with partial aggregation
# =========================================================================

def q1_lineitem_agg(sf_dir: str) -> pd.DataFrame:
    """Grouped sums/avg/count over lineitem (reference A1/A2 counters
    generalized; pre-aggregated per batch before the shuffle)."""
    ds = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def with_disc(batch: pa.Table) -> pa.Table:
        disc = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return batch.append_column("disc_price", disc)

    ds = ds.map_batches(with_disc, batch_format="pyarrow")
    out = partial_grouped_sum(
        ds,
        ["l_returnflag", "l_linestatus"],
        sums=["l_quantity", "l_extendedprice", "disc_price"],
        count_alias="count_order",
    ).to_pandas()
    df = pd.DataFrame(
        {
            "l_returnflag": out["l_returnflag"],
            "l_linestatus": out["l_linestatus"],
            "sum_qty": out["sum_l_quantity"].round(2),
            "sum_base_price": out["sum_l_extendedprice"].round(2),
            "sum_disc_price": out["sum_disc_price"].round(2),
            "avg_qty": (out["sum_l_quantity"] / out["count_order"]).round(4),
            "count_order": out["count_order"].astype("int64"),
        }
    )
    return df.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                        AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                   AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_quantity) / COUNT(*), 4)             AS avg_qty,
       COUNT(*)                                         AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def orders_status_counts(sf_dir: str) -> pd.DataFrame:
    """Filter + grouped count (M16/M17 success-predicate analog).
    The predicate is pushed into the parquet read (row-group pruning)."""
    import pyarrow.dataset as pads

    ds = rd.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderstatus", "o_orderpriority"],
        filter=pads.field("o_orderstatus") == "O",
    )
    out = partial_grouped_sum(ds, ["o_orderpriority"], count_alias="n").to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


_ORDERS_STATUS_SQL = """
SELECT o_orderpriority, COUNT(*) AS n
FROM orders WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# =========================================================================
# B. Joins (J-series): broadcast dimension join + bucketed hash join
# =========================================================================

def region_customer_rollup(sf_dir: str) -> pd.DataFrame:
    """customer ⋈ nation ⋈ region via broadcast dicts (J2/J3 pattern:
    dimension tables shipped once with ray.put, looked up per batch)."""
    import pyarrow.parquet as pq

    nation = pq.read_table(_p(sf_dir, "nation"))
    region = pq.read_table(_p(sf_dir, "region"))
    n2r = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist()))
    r2name = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    lut = {n: r2name[r] for n, r in n2r.items()}
    lut_keys = pa.array(list(lut.keys()), pa.int64())
    lut_vals = pa.array(list(lut.values()), pa.string())
    lookup_ref = ray.put((lut_keys, lut_vals))

    class AddRegion:
        def __init__(self):
            self.keys, self.vals = ray.get(lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            idx = pc.index_in(pc.cast(batch["c_nationkey"], pa.int64()), value_set=self.keys)
            names = pc.take(self.vals, idx)
            return batch.append_column("r_name", names)

    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    ds = ds.map_batches(AddRegion, batch_format="pyarrow", concurrency=(1, 4))
    out = partial_grouped_sum(ds, ["r_name"], sums=["c_acctbal"], count_alias="n_customers").to_pandas()
    df = pd.DataFrame(
        {
            "r_name": out["r_name"],
            "n_customers": out["n_customers"].astype("int64"),
            "total_acctbal": out["sum_c_acctbal"].round(2),
        }
    )
    return df.sort_values("r_name").reset_index(drop=True)


_REGION_CUSTOMER_SQL = """
SELECT r_name, COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 2) AS total_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


def q3_top_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 shape in ONE shuffle: semi-filter orders by BUILDING
    customers (broadcast key set — at cardinalities where the segment's
    customer keys no longer broadcast, swap in stages/join.bloom_semi_anti
    with keep_in=True: same semantics, bloom prescreen + exact verify),
    per-batch partial lineitem revenue,
    then bucket BOTH sides by hash(orderkey) and union — a single
    groupby(bucket) co-locates each key's order row and revenue
    partials; map_groups finishes the aggregation and the join together.
    """
    import pyarrow.parquet as pq

    cust = pq.read_table(_p(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    building = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))["c_custkey"].to_pylist()
    keys_ref = ray.put(building)
    num_buckets = 16

    def bucket_of(col: pa.ChunkedArray) -> pa.Array:
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.array((v % num_buckets).astype(np.int32))

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders = broadcast_filter(orders, "o_custkey", keys_ref, keep_in=True)

    def tag_orders(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "__b": bucket_of(batch["o_orderkey"]),
                "o_orderkey": batch["o_orderkey"],
                "o_orderdate": batch["o_orderdate"],
                "rev": pa.nulls(len(batch), pa.float64()),
            }
        )

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def li_partial(batch: pa.Table) -> pa.Table:
        r = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        part = (
            pa.table({"o_orderkey": batch["l_orderkey"], "rev": r})
            .group_by(["o_orderkey"])
            .aggregate([("rev", "sum")])
            .rename_columns(["o_orderkey", "rev"])
        )
        return pa.table(
            {
                "__b": bucket_of(part["o_orderkey"]),
                "o_orderkey": part["o_orderkey"],
                "o_orderdate": pa.nulls(len(part), pa.timestamp("us")),
                "rev": part["rev"],
            }
        )

    both = orders.map_batches(tag_orders, batch_format="pyarrow").union(
        li.map_batches(li_partial, batch_format="pyarrow")
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["rev"].isna()][["o_orderkey", "o_orderdate"]]
        r = g[g["rev"].notna()].groupby("o_orderkey", as_index=False)["rev"].sum()
        m = o.merge(r, on="o_orderkey", how="inner")
        if m.empty:
            return pd.DataFrame({"o_orderkey": [], "o_orderdate": [], "rev": []})
        # local top-k per bucket: global top-10 is within per-bucket top-10
        m["rev_r"] = m["rev"].round(2)
        return m.sort_values(["rev_r", "o_orderkey"], ascending=[False, True], kind="mergesort").head(10)[
            ["o_orderkey", "o_orderdate", "rev"]
        ]

    df = both.groupby("__b").map_groups(finish, batch_format="pandas").to_pandas()
    df["revenue"] = df["rev"].round(2)
    df = df[["o_orderkey", "o_orderdate", "revenue"]]
    df = df.sort_values(["revenue", "o_orderkey"], ascending=[False, True], kind="mergesort").head(10)
    df["o_orderkey"] = df["o_orderkey"].astype("int64")
    return df.reset_index(drop=True)


_Q3_SQL = """
SELECT o_orderkey, o_orderdate,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


def q5_region_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 shape (6-table join), fact tables joined by SHUFFLE:

    - orders ⋈ customer and lineitem ⋈ orders go through the bucketed
      ``hash_join`` (one groupby shuffle each) — no fact table is ever
      broadcast or materialized on the driver, so the plan survives
      100× (r1 review finding #1 fixed).
    - Only genuinely small sides broadcast: supplier (s_suppkey →
      s_nationkey, an Arrow table read via zero-copy ``ray.put`` +
      vectorized ``pc.index_in``/``take`` per batch) and the ≤25-row
      nation/region chain.
    - lineitem revenue is pre-aggregated per (orderkey, supp-nation)
      inside map_batches BEFORE its shuffle, so only partials move.
    """
    import pyarrow.parquet as pq

    nation = pq.read_table(_p(sf_dir, "nation"))
    region = pq.read_table(_p(sf_dir, "region"))
    r_name = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    asia = [
        n
        for n, r in zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist())
        if r_name[r] == "ASIA"
    ]
    nk_arr = nation["n_nationkey"].combine_chunks()
    nname_arr = nation["n_name"].combine_chunks()
    supp = pq.read_table(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    supp_ref = ray.put(supp)
    asia_set = pa.array(sorted(asia), pa.int64())

    li = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        s = ray.get(supp_ref)  # zero-copy plasma read, cached per process
        idx = pc.index_in(batch["l_suppkey"], value_set=s["s_suppkey"].combine_chunks())
        s_nat = pc.take(s["s_nationkey"].combine_chunks(), idx)
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        t = pa.table(
            {"l_orderkey": batch["l_orderkey"], "s_nat": pc.cast(s_nat, pa.int64()), "rev": rev}
        ).filter(pc.is_in(pc.cast(s_nat, pa.int64()), value_set=asia_set))
        part = (
            t.group_by(["l_orderkey", "s_nat"])
            .aggregate([("rev", "sum")])
            .rename_columns(["l_orderkey", "s_nat", "rev"])
        )
        return part

    li_p = li.map_batches(li_partial, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    oc = hash_join(orders, cust, on="o_custkey", right_on="c_custkey", num_buckets=16)
    oc_slim = oc.map_batches(
        lambda t: pa.table({"o_orderkey": t["o_orderkey"], "c_nat": pc.cast(t["c_nationkey"], pa.int64())}),
        batch_format="pyarrow",
    )

    j = hash_join(li_p, oc_slim, on="l_orderkey", right_on="o_orderkey", num_buckets=16)

    def finish(batch: pa.Table) -> pa.Table:
        # Q5 predicate: customer and supplier in the same (ASIA) nation
        m = batch.filter(pc.equal(batch["s_nat"], batch["c_nat"]))
        idx = pc.index_in(m["s_nat"], value_set=pc.cast(nk_arr, pa.int64()))
        names = pc.take(nname_arr, idx)
        return pa.table({"n_name": names, "rev": m["rev"]})

    out = partial_grouped_sum(
        j.map_batches(finish, batch_format="pyarrow"), ["n_name"], sums=["rev"]
    ).to_pandas()
    df = pd.DataFrame({"n_name": out["n_name"], "revenue": out["sum_rev"].round(2)})
    return df.sort_values(["revenue", "n_name"], ascending=[False, True], kind="mergesort").reset_index(drop=True)


_Q5_SQL = """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q7_volume_shipping(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 shape: revenue between (supplier nation, customer
    nation) pairs in {(NATION_6, NATION_7), (NATION_7, NATION_6)} by
    ship year.  Same plan family as q5: fact⋈fact via bucketed
    hash_join (orders⋈customer, then lineitem-partials⋈that), supplier
    and nation broadcast with vectorized index_in lookups, lineitem
    revenue PRE-FILTERED to the two supplier nations and pre-aggregated
    per (orderkey, supp_nation, year) before its shuffle."""
    import pyarrow.parquet as pq

    nation = pq.read_table(_p(sf_dir, "nation"))
    n2name = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))
    want = {"NATION_6", "NATION_7"}
    want_keys = pa.array(sorted(k for k, v in n2name.items() if v in want), pa.int64())
    nk_arr = pc.cast(nation["n_nationkey"].combine_chunks(), pa.int64())
    nname_arr = nation["n_name"].combine_chunks()
    supp = pq.read_table(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    supp_ref = ray.put(supp)

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def li_partial(batch: pa.Table) -> pa.Table:
        s = ray.get(supp_ref)
        idx = pc.index_in(batch["l_suppkey"], value_set=s["s_suppkey"].combine_chunks())
        s_nat = pc.cast(pc.take(s["s_nationkey"].combine_chunks(), idx), pa.int64())
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        yr = pc.cast(pc.year(batch["l_shipdate"]), pa.int32())
        t = pa.table(
            {"l_orderkey": batch["l_orderkey"], "s_nat": s_nat, "l_year": yr, "rev": rev}
        ).filter(pc.is_in(s_nat, value_set=want_keys))
        return (
            t.group_by(["l_orderkey", "s_nat", "l_year"])
            .aggregate([("rev", "sum")])
            .rename_columns(["l_orderkey", "s_nat", "l_year", "rev"])
        )

    li_p = li.map_batches(li_partial, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    oc = hash_join(orders, cust, on="o_custkey", right_on="c_custkey", num_buckets=16)
    oc_slim = oc.map_batches(
        lambda t: pa.table(
            {"o_orderkey": t["o_orderkey"], "c_nat": pc.cast(t["c_nationkey"], pa.int64())}
        ).filter(pc.is_in(pc.cast(t["c_nationkey"], pa.int64()), value_set=want_keys)),
        batch_format="pyarrow",
    )
    j = hash_join(li_p, oc_slim, on="l_orderkey", right_on="o_orderkey", num_buckets=16)

    def finish(batch: pa.Table) -> pa.Table:
        m = batch.filter(pc.not_equal(batch["s_nat"], batch["c_nat"]))  # cross-nation pairs only
        sn = pc.take(nname_arr, pc.index_in(m["s_nat"], value_set=nk_arr))
        cn = pc.take(nname_arr, pc.index_in(m["c_nat"], value_set=nk_arr))
        return pa.table({"supp_nation": sn, "cust_nation": cn, "l_year": m["l_year"], "rev": m["rev"]})

    out = partial_grouped_sum(
        j.map_batches(finish, batch_format="pyarrow"), ["supp_nation", "cust_nation", "l_year"], sums=["rev"]
    ).to_pandas()
    if out.empty or "supp_nation" not in out.columns:  # schema-stable empty
        return pd.DataFrame(
            {
                "supp_nation": pd.Series(dtype="object"),
                "cust_nation": pd.Series(dtype="object"),
                "l_year": pd.Series(dtype="int32"),
                "revenue": pd.Series(dtype="float64"),
            }
        )
    df = pd.DataFrame(
        {
            "supp_nation": out["supp_nation"],
            "cust_nation": out["cust_nation"],
            "l_year": out["l_year"].astype("int32"),
            "revenue": out["sum_rev"].round(2),
        }
    )
    return df.sort_values(["supp_nation", "cust_nation", "l_year"]).reset_index(drop=True)


_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_6')
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def top3_events_per_user(sf_dir: str) -> pd.DataFrame:
    """Windowed rank (§2.6 beyond-reference): top-3 events by (value
    desc, event_id asc) per user — one hash-bucket shuffle, vectorized
    per-bucket rank via sorted cumcount (no per-user python)."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    num_buckets = 16

    def tag(batch: pa.Table) -> pa.Table:
        v = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.append_column("__b", pa.array((v % num_buckets).astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(value_r=g["value"].round(4)).sort_values(
            ["user_id", "value_r", "event_id"], ascending=[True, False, True], kind="mergesort"
        )
        g["rn"] = g.groupby("user_id").cumcount() + 1
        out = g[g["rn"] <= 3]
        return pd.DataFrame(
            {
                "user_id": out["user_id"].astype("int64"),
                "event_id": out["event_id"].astype("int64"),
                "value_r": out["value_r"],
                "rn": out["rn"].astype("int64"),
            }
        )

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["user_id", "rn"]).reset_index(drop=True)


_TOP3_SQL = """
WITH r AS (
  SELECT user_id, event_id, ROUND(value, 4) AS value_r,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ROUND(value, 4) DESC, event_id) AS rn
  FROM events)
SELECT user_id, event_id, value_r, rn FROM r WHERE rn <= 3
ORDER BY user_id, rn
"""


def value_quantiles_by_type(sf_dir: str, sketch: bool = False) -> pd.DataFrame:
    """Grouped exact quantiles (median / p90 of value per event_type):
    groupby(type).map_groups with numpy linear interpolation — the same
    interpolation as DuckDB's quantile_cont, so hash-exact.

    ``sketch=True`` switches to the t-digest partial-merge plan
    (stages/agg.grouped_quantiles_tdigest): per-batch digests, only
    sketch bytes shuffle, skewed keys merge O(blocks) digests instead of
    materializing every group row in one task — the 100-TB path, rank
    error ≲ 1/200.  Exact stays the oracle-checked default at sf scale
    (sketch-vs-exact error bound pinned in tests/test_extras.py)."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    if sketch:
        from ..stages.agg import grouped_quantiles_tdigest

        out = grouped_quantiles_tdigest(ds, "event_type", "value", qs=(0.5, 0.9)).to_pandas()
        out["n"] = out["n"].astype("int64")
        return out.sort_values("event_type").reset_index(drop=True)

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n": [np.int64(len(v))],
                "p50": [round(float(np.quantile(v, 0.5)), 4)],
                "p90": [round(float(np.quantile(v, 0.9)), 4)],
            }
        )

    out = ds.groupby("event_type").map_groups(per_type, batch_format="pandas").to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


_QUANTILES_SQL = """
SELECT event_type, COUNT(*) AS n,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.9), 4) AS p90
FROM events GROUP BY event_type ORDER BY event_type
"""


def events_in_windows(sf_dir: str) -> pd.DataFrame:
    """Range (interval) join: every event falling inside one of the
    30-minute campaign windows opened by each event_id % 997 == 0 event
    (stages/rangejoin.interval_join — intervals exploded to covered
    hour-buckets, points tagged with their single bucket, ONE groupby
    shuffle, exact bounds check in-group).  Oracle: plain BETWEEN join."""
    from ..stages.rangejoin import interval_join

    ds = _read(sf_dir, "events", columns=["event_id", "ts"])

    def mk_windows(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ids % 997 == 0))
        lo = sub["ts"]
        hi = pc.cast(pc.add(pc.cast(lo, pa.int64()), 1_800_000_000), pa.timestamp("us"))
        return pa.table(
            {"window_id": sub["event_id"], "lo": pc.cast(lo, pa.timestamp("us")), "hi": hi}
        )

    windows = ds.map_batches(mk_windows, batch_format="pyarrow")
    joined = interval_join(
        ds,
        windows,
        ts_col="ts",
        lo_col="lo",
        hi_col="hi",
        bucket_width_us=3_600_000_000,  # 1 h buckets ≈ 2× the span
        point_cols=["event_id", "ts"],
        interval_cols=["window_id", "lo", "hi"],
    )
    out = joined.map_batches(
        lambda t: t.select(["window_id", "event_id"]), batch_format="pyarrow"
    ).to_pandas()
    out["window_id"] = out["window_id"].astype("int64")
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values(["window_id", "event_id"]).reset_index(drop=True)


_RANGE_JOIN_SQL = """
WITH w AS (
  SELECT event_id AS window_id, ts AS lo, ts + INTERVAL 30 MINUTE AS hi
  FROM events WHERE event_id % 997 = 0
)
SELECT w.window_id, e.event_id
FROM events e JOIN w ON e.ts BETWEEN w.lo AND w.hi
ORDER BY window_id, event_id
"""


def distinct_users_by_type(sf_dir: str) -> pd.DataFrame:
    """Exact grouped distinct count — two-level: per-batch unique
    (type, user) pairs via Arrow group_by, one groupby shuffle of the
    deduped PAIRS (never raw events), then a grouped count.  The
    approximate path for 100 TB cardinalities is the HyperLogLog sketch
    (state/hll.hll_grouped_distinct — partials merge register-wise, only
    2^p bytes per group move; accuracy test in tests/test_state.py)."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def uniq_pairs(batch: pa.Table) -> pa.Table:
        return (
            batch.group_by(["event_type", "user_id"])
            .aggregate([([], "count_all")])
            .select(["event_type", "user_id"])
        )

    pairs = ds.map_batches(uniq_pairs, batch_format="pyarrow")
    deduped = pairs.groupby(["event_type", "user_id"]).aggregate(Count(alias_name="__c"))
    out = partial_grouped_sum(deduped, ["event_type"], count_alias="n_distinct_users").to_pandas()
    out["n_distinct_users"] = out["n_distinct_users"].astype("int64")
    return out[["event_type", "n_distinct_users"]].sort_values("event_type").reset_index(drop=True)


_DISTINCT_USERS_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_users
FROM events GROUP BY event_type ORDER BY event_type
"""


def customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Anti join (J4 seen-set shape) on the 10^9-key plan: Bloom
    prescreen (built distributed over the orders keys, driver holds only
    the bit array) + exact hash-join verify of the bloom-positive
    minority (stages/join.bloom_semi_anti) — no driver key list, no
    broadcast.  Ghost customers (c_custkey % 10 == 0 → +10M copy with no
    orders) are planted — SQL-reproducibly — so the anti join returns a
    non-empty, hash-checked result instead of passing on 0 rows."""
    from ..stages.join import bloom_semi_anti

    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch["c_custkey"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % 10 == 0))
        names = pc.binary_join_element_wise(pa.scalar("ghost-"), sub["c_name"], "")
        return pa.table(
            {"c_custkey": pc.add(sub["c_custkey"], 10_000_000), "c_name": names}
        )

    aug = ds.union(ds.map_batches(plant, batch_format="pyarrow"))
    okeys = _read(sf_dir, "orders", columns=["o_custkey"])
    out = bloom_semi_anti(aug, "c_custkey", okeys, "o_custkey", keep_in=False).to_pandas()
    if out.empty:  # schema-stable empty result
        out = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"), "c_name": pd.Series(dtype="object")})
    out["c_custkey"] = out["c_custkey"].astype("int64")
    return out.sort_values("c_custkey").reset_index(drop=True)


_ANTI_SQL = """
WITH cust_aug AS (
  SELECT c_custkey, c_name FROM customer
  UNION ALL
  SELECT c_custkey + 10000000 AS c_custkey, 'ghost-' || c_name AS c_name
  FROM customer WHERE c_custkey % 10 = 0
)
SELECT c_custkey, c_name FROM cust_aug
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey
"""


def jaccard_adjacent_docs(sf_dir: str) -> pd.DataFrame:
    """Self hash-join documents on doc_id+1; char-set Jaccard per pair
    (matches DuckDB's jaccard()).  Exercises the bucketed join path."""
    a = _read(sf_dir, "documents", columns=["doc_id", "text"])
    b = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def shift(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.subtract(batch["doc_id"], pa.scalar(1, pa.int64())),
                "text_next": batch["text"],
            }
        )

    b = b.map_batches(shift, batch_format="pyarrow")
    joined = hash_join(a, b, on="doc_id", num_buckets=16)

    def sim(batch: pa.Table) -> pa.Table:
        sims = [
            round(H.char_jaccard(x, y), 4)
            for x, y in zip(batch["text"].to_pylist(), batch["text_next"].to_pylist())
        ]
        return pa.table({"doc_id": batch["doc_id"], "sim": pa.array(sims, pa.float64())})

    out = joined.map_batches(sim, batch_format="pyarrow").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


_JACCARD_ADJ_SQL = """
SELECT a.doc_id AS doc_id, ROUND(jaccard(a.text, b.text), 4) AS sim
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
ORDER BY a.doc_id
"""


# =========================================================================
# C. Streaming-shaped (S3/O1, §2.9): windows, sessions, ready queue, dedup
# =========================================================================

def events_hourly(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    out = tumbling_window_agg(ds, "event_type", "ts", "value", window="hour").to_pandas()
    df = pd.DataFrame(
        {
            "event_type": out["event_type"],
            "window_start": out["window_start"],
            "n": out["n"].astype("int64"),
            "sum_value": out["sum_value"].round(2),
        }
    )
    return df.sort_values(["event_type", "window_start"]).reset_index(drop=True)


_EVENTS_HOURLY_SQL = """
SELECT event_type, date_trunc('hour', ts) AS window_start,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def user_sessions(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    out = session_counts(ds, "user_id", "ts", pd.Timedelta(minutes=30)).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["n_sessions"] = out["n_sessions"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


_SESSIONS_SQL = """
WITH d AS (
  SELECT user_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events)
SELECT user_id, CAST(SUM(new_s) + 1 AS BIGINT) AS n_sessions
FROM d GROUP BY user_id ORDER BY user_id
"""


def due_events(sf_dir: str) -> pd.DataFrame:
    """Ready-time queue pop (S3/O1: ZRANGEBYSCORE 0..now analog); the
    watermark predicate is pushed into the parquet read."""
    import pyarrow.dataset as pads

    watermark = pd.Timestamp("2024-01-03 00:00:00")
    ds = rd.read_parquet(
        _p(sf_dir, "events"),
        columns=["event_id", "user_id", "ts"],
        filter=pads.field("ts") <= pads.scalar(watermark.to_datetime64()),
    )
    out = ready_queue(ds, "ts", watermark, ["ts", "event_id"], limit=100).to_pandas()
    for c in ("event_id", "user_id"):
        out[c] = out[c].astype("int64")
    return out[["event_id", "user_id", "ts"]].reset_index(drop=True)


_DUE_SQL = """
SELECT event_id, user_id, ts FROM events
WHERE ts <= TIMESTAMP '2024-01-03 00:00:00'
ORDER BY ts, event_id LIMIT 100
"""


def first_event_per_key(sf_dir: str) -> pd.DataFrame:
    """Exact keyed dedup, first-wins (J5: seen_messages skip)."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])
    out = (
        ds.groupby(["user_id", "event_type"])
        .aggregate(Min("ts", alias_name="first_ts"), Count(alias_name="n"))
        .to_pandas()
    )
    out["user_id"] = out["user_id"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["user_id", "event_type"]).reset_index(drop=True)


_FIRST_EVENT_SQL = """
SELECT user_id, event_type, MIN(ts) AS first_ts, COUNT(*) AS n
FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type
"""


def top_users_by_events(sf_dir: str) -> pd.DataFrame:
    """Grouped count + top-k (no global sort: aggregate then head)."""
    ds = _read(sf_dir, "events", columns=["user_id"])
    out = partial_grouped_sum(ds, ["user_id"], count_alias="n").to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["n"] = out["n"].astype("int64")
    out = out.sort_values(["n", "user_id"], ascending=[False, True], kind="mergesort").head(10)
    return out.reset_index(drop=True)


_TOP_USERS_SQL = """
SELECT user_id, COUNT(*) AS n FROM events
GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10
"""


# =========================================================================
# D. Text analysis + URL ops (M2/M3 + training-data extensions)
# =========================================================================

def token_stats_by_lang(sf_dir: str) -> pd.DataFrame:
    """Whitespace token counting, vectorized with Arrow kernels.

    Token spec (oracle-exact): n = count(' ') + 1 over the raw text.
    """
    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def toks(batch: pa.Table) -> pa.Table:
        n = pc.add(pc.count_substring(batch["text"], " "), 1)
        return pa.table({"lang": batch["lang"], "n_tokens": pc.cast(n, pa.int64())})

    out = partial_grouped_sum(
        ds.map_batches(toks, batch_format="pyarrow"), ["lang"], sums=["n_tokens"], count_alias="n_docs"
    ).to_pandas()
    df = pd.DataFrame(
        {
            "lang": out["lang"],
            "total_tokens": out["sum_n_tokens"].astype("int64"),
            "n_docs": out["n_docs"].astype("int64"),
        }
    )
    df["avg_tokens"] = (df["total_tokens"] / df["n_docs"]).round(4)
    return df.sort_values("lang").reset_index(drop=True)


_TOKEN_STATS_SQL = """
SELECT lang,
       CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS total_tokens,
       COUNT(*)                                                          AS n_docs,
       ROUND(SUM(length(text) - length(replace(text, ' ', '')) + 1) * 1.0
             / COUNT(*), 4)                                              AS avg_tokens
FROM documents GROUP BY lang ORDER BY lang
"""


def quality_by_lang(sf_dir: str) -> pd.DataFrame:
    """Quality scoring: mean token length per lang (oracle-exact formula:
    (chars - spaces) / (spaces + 1), averaged)."""
    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def metrics(batch: pa.Table) -> pa.Table:
        chars = pc.cast(pc.utf8_length(batch["text"]), pa.float64())
        spaces = pc.cast(pc.count_substring(batch["text"], " "), pa.float64())
        mtl = pc.divide(pc.subtract(chars, spaces), pc.add(spaces, 1.0))
        return pa.table({"lang": batch["lang"], "mtl": mtl})

    out = partial_grouped_sum(
        ds.map_batches(metrics, batch_format="pyarrow"), ["lang"], sums=["mtl"], count_alias="n_docs"
    ).to_pandas()
    df = pd.DataFrame(
        {
            "lang": out["lang"],
            "avg_mean_token_len": (out["sum_mtl"] / out["n_docs"]).round(4),
            "n_docs": out["n_docs"].astype("int64"),
        }
    )
    return df.sort_values("lang").reset_index(drop=True)


_QUALITY_SQL = """
SELECT lang,
       ROUND(AVG((length(text) - (length(text) - length(replace(text, ' ', ''))))
                 / (length(text) - length(replace(text, ' ', '')) + 1.0)), 4) AS avg_mean_token_len,
       COUNT(*) AS n_docs
FROM documents GROUP BY lang ORDER BY lang
"""


def quality_top_decile(sf_dir: str) -> pd.DataFrame:
    """Quantile-gated quality filtering (the FineWeb-Edu-style 'keep the
    top X% by score' selection): per-lang p90 of the mean-token-length
    score as a DISCRETE quantile (numpy method='inverted_cdf' ≡ DuckDB
    quantile_disc — an actual data value, so the >= threshold compare
    is exact, no interpolation ulps), then a map-side filter against
    the broadcast K-row threshold table.  Two slim passes over
    (lang, mtl): one grouped quantile, one broadcast-filtered count —
    document text is read once and never shuffles."""
    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def metrics(batch: pa.Table) -> pa.Table:
        chars = pc.cast(pc.utf8_length(batch["text"]), pa.float64())
        spaces = pc.cast(pc.count_substring(batch["text"], " "), pa.float64())
        mtl = pc.divide(pc.subtract(chars, spaces), pc.add(spaces, 1.0))
        return pa.table({"lang": batch["lang"], "mtl": mtl})

    scored = ds.map_batches(metrics, batch_format="pyarrow").materialize()

    def p90(g: pd.DataFrame) -> pd.DataFrame:
        v = g["mtl"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]],
                "thr": [float(np.quantile(v, 0.9, method="inverted_cdf"))],
            }
        )

    # K rows (the language vocabulary) — driver-held by design, broadcast once
    thr_rows = scored.groupby("lang").map_groups(p90, batch_format="pandas").take_all()
    thr_ref = ray.put(
        (
            pa.array([r["lang"] for r in thr_rows], pa.string()),
            np.array([r["thr"] for r in thr_rows], dtype=np.float64),
        )
    )

    def gate(batch: pa.Table) -> pa.Table:
        # vectorized broadcast lookup: index_in + take (the J2 pattern),
        # not a Python dict probe per row
        keys, vals = ray.get(thr_ref)
        mtl = batch["mtl"].to_numpy(zero_copy_only=False)
        pos = pc.index_in(batch["lang"].combine_chunks(), value_set=keys).to_numpy(
            zero_copy_only=False
        )
        thv = vals[pos.astype(np.int64)]
        return pa.table(
            {
                "lang": batch["lang"],
                "kept": pa.array((mtl >= thv).astype(np.float64)),
            }
        )

    out = partial_grouped_sum(
        scored.map_batches(gate, batch_format="pyarrow"),
        ["lang"], sums=["kept"], count_alias="n_docs",
    ).to_pandas()
    df = pd.DataFrame(
        {
            "lang": out["lang"],
            "p90_mtl": [round({r["lang"]: r["thr"] for r in thr_rows}[lg], 4) for lg in out["lang"]],
            "n_kept": out["sum_kept"].astype("int64"),
            "n_docs": out["n_docs"].astype("int64"),
        }
    )
    return df.sort_values("lang").reset_index(drop=True)


_QUALITY_TOP_DECILE_SQL = """
WITH s AS (
  SELECT lang,
         (length(text) - (length(text) - length(replace(text, ' ', ''))))
           / ((length(text) - length(replace(text, ' ', ''))) + 1.0) AS mtl
  FROM documents
), thr AS (
  SELECT lang, quantile_disc(mtl, 0.9) AS thr FROM s GROUP BY lang
)
SELECT s.lang, ROUND(t.thr, 4) AS p90_mtl,
       CAST(COUNT(*) FILTER (WHERE s.mtl >= t.thr) AS BIGINT) AS n_kept,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM s JOIN thr t ON t.lang = s.lang
GROUP BY s.lang, t.thr ORDER BY s.lang
"""


def bpe_token_stats(sf_dir: str) -> pd.DataFrame:
    """Sub-word-ish (BPE stand-in) token counting: words + punctuation
    marks, counted with the vectorized RE2 kernel
    ``pc.count_substring_regex`` — the exact regex engine DuckDB's
    ``regexp_extract_all`` uses, so the oracle matches by construction."""
    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def toks(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch["text"], r"\w+|[^\w\s]")
        return pa.table({"lang": batch["lang"], "n_bpe": pc.cast(n, pa.int64())})

    out = partial_grouped_sum(
        ds.map_batches(toks, batch_format="pyarrow"), ["lang"], sums=["n_bpe"], count_alias="n_docs"
    ).to_pandas()
    df = pd.DataFrame(
        {
            "lang": out["lang"],
            "total_bpe": out["sum_n_bpe"].astype("int64"),
            "n_docs": out["n_docs"].astype("int64"),
        }
    )
    df["avg_bpe"] = (df["total_bpe"] / df["n_docs"]).round(4)
    return df.sort_values("lang").reset_index(drop=True)


_BPE_TOKEN_SQL = """
SELECT lang,
       CAST(SUM(len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))) AS BIGINT) AS total_bpe,
       COUNT(*) AS n_docs,
       ROUND(SUM(len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))) * 1.0 / COUNT(*), 4) AS avg_bpe
FROM documents GROUP BY lang ORDER BY lang
"""


def top_tokens(sf_dir: str) -> "rd.Dataset":
    """EXACT corpus-wide top-20 tokens WITHOUT shuffling the token
    stream (stages/textsearch.exact_top_tokens): per-batch Misra-Gries
    summaries (≤ m rows + omission bound θ_b) → one bounded groupby →
    provable candidate set → exact recount of candidates only.  The
    guarantee Θ < k-th lower bound is CHECKED at runtime — the operator
    raises rather than silently approximate."""
    from ..stages.textsearch import exact_top_tokens

    ds = _read(sf_dir, "documents", columns=["text"])
    return exact_top_tokens(ds, "text", k=20, m=1024)


_TOP_TOKENS_SQL = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '\\w+')) AS tok FROM documents
)
SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
FROM toks GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20
"""


def top_bigrams(sf_dir: str) -> "rd.Dataset":
    """EXACT corpus-wide top-20 word BIGRAMS — the LM-stats variant of
    top_tokens (same Misra-Gries summary → provable candidates → exact
    recount machinery, ngram=2), so the n-gram stream never shuffles
    either.  N-grams never cross a document boundary."""
    from ..stages.textsearch import exact_top_tokens

    ds = _read(sf_dir, "documents", columns=["text"])
    return exact_top_tokens(ds, "text", k=20, m=4096, ngram=2)


_TOP_BIGRAMS_SQL = r"""
WITH toks AS (
  SELECT regexp_extract_all(lower(text), '\w+') AS t FROM documents
), bg AS (
  SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS tok
  FROM toks WHERE len(t) >= 2
)
SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
FROM bg GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20
"""


def delta_novel_docs(sf_dir: str) -> pd.DataFrame:
    """Incremental-ingest dedup: treat the upper half of doc_id space as
    a NEW crawl batch and keep only its docs whose 5-token prefix
    fingerprint was never seen in the base corpus (lower half) — the
    content-seen analog of the frontier's URL-seen anti-join (reference
    utils.py url-seen semantics applied to content).  The base side is
    bloom-prescreened then exactly verified (stages/join.bloom_semi_anti,
    the 10^9-key path), so a mostly-novel delta stream never shuffles."""

    def fp_batch(batch: pa.Table) -> pa.Table:
        from itertools import islice

        # early-exit after 5 token matches instead of tokenizing the
        # whole document (same first-5 semantics as the SQL [1:5] slice)
        fps = [
            " ".join(m.group(0) for m in islice(H._TOKEN_RE.finditer((t or "").lower()), 5))
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "fp": pa.array(fps, pa.string())}
        )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    split = (int(ds.max("doc_id")) + 1) // 2
    # materialize: the per-doc tokenize+fingerprint pass is consumed by
    # BOTH filter branches (and the base side again inside bloom_semi_anti)
    # — without this it re-executes from lineage per consumer
    fps = ds.map_batches(fp_batch, batch_format="pyarrow").materialize()
    base = fps.filter(expr=f"doc_id < {split}").select_columns(["fp"])
    delta = fps.filter(expr=f"doc_id >= {split}")
    novel = bloom_semi_anti(delta, "fp", base, "fp", keep_in=False)
    out = novel.to_pandas().sort_values("doc_id").reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype("int64")
    return out[["doc_id", "fp"]]


_DELTA_NOVEL_SQL = r"""
WITH d AS (
  SELECT doc_id,
         array_to_string(regexp_extract_all(lower(text), '\w+')[1:5], ' ') AS fp
  FROM documents
)
SELECT doc_id, fp FROM d
WHERE doc_id >= (SELECT (MAX(doc_id) + 1) // 2 FROM d)
  AND NOT EXISTS (
    SELECT 1 FROM d b
    WHERE b.doc_id < (SELECT (MAX(doc_id) + 1) // 2 FROM d) AND b.fp = d.fp)
ORDER BY doc_id
"""


def tfidf_top_terms(sf_dir: str) -> pd.DataFrame:
    """Per-source top-3 terms by tf-idf (tf = term count in the source's
    docs, idf = ln(N_docs / doc_freq)).  Both factor tables are partial-
    aggregated inside map_batches before their groupbys, and the join is
    the bucketed hash_join on the (already tiny) aggregated tables — the
    full token stream never shuffles."""
    import math

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])
    n_docs = ds.count()

    def tf_partial(batch: pa.Table) -> pa.Table:
        srcs = batch["source"].to_pylist()
        texts = batch["text"].to_pylist()
        keys: list = []
        for s, t in zip(srcs, texts):
            keys.extend(f"{s}\x00{w}" for w in H.tokens(t or ""))
        if not keys:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "tok": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        vals, cnts = np.unique(np.asarray(keys, dtype=object), return_counts=True)
        pairs = [k.split("\x00", 1) for k in vals]
        return pa.table(
            {
                "source": pa.array([p[0] for p in pairs], pa.string()),
                "tok": pa.array([p[1] for p in pairs], pa.string()),
                "tf": pa.array(cnts.astype(np.int64)),
            }
        )

    def df_partial(batch: pa.Table) -> pa.Table:
        toks: list = []
        for t in batch["text"].to_pylist():
            toks.extend(set(H.tokens(t or "")))
        if not toks:
            return pa.table(
                {"tok": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        vals, cnts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table(
            {"tok": pa.array(vals, pa.string()), "df": pa.array(cnts.astype(np.int64))}
        )

    from ray.data.aggregate import Sum

    tf = (
        ds.map_batches(tf_partial, batch_format="pyarrow")
        .groupby(["source", "tok"])
        .aggregate(Sum("tf", alias_name="tf"))
    )
    dfreq = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("df", alias_name="df"))
    )
    joined = hash_join(tf, dfreq, on="tok")

    def score(batch: pa.Table) -> pa.Table:
        tf_a = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df_a = batch["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        tfidf = np.round(tf_a * np.log(float(n_docs) / df_a), 4)
        return pa.table(
            {"source": batch["source"], "tok": batch["tok"], "tfidf": pa.array(tfidf)}
        )

    def top3(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tfidf", "tok"], ascending=[False, True], kind="mergesort")
        return g.head(3)

    out = (
        joined.map_batches(score, batch_format="pyarrow")
        .groupby("source")
        .map_groups(top3)
        .to_pandas()
    )
    return out.sort_values(["source", "tok"]).reset_index(drop=True)


_TFIDF_SQL = r"""
WITH toks AS (
  SELECT doc_id, source, unnest(regexp_extract_all(lower(text), '\w+')) AS tok
  FROM documents
), tf AS (
  SELECT source, tok, COUNT(*) AS tf FROM toks GROUP BY source, tok
), dfreq AS (
  SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok
), s AS (
  SELECT tf.source, tf.tok,
         ROUND(tf.tf * ln((SELECT COUNT(*) FROM documents) * 1.0 / dfreq.df), 4)
           AS tfidf
  FROM tf JOIN dfreq USING (tok)
)
SELECT source, tok, tfidf FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY source ORDER BY tfidf DESC, tok) AS rn
  FROM s
) WHERE rn <= 3 ORDER BY source, tok
"""


def bm25_top10(sf_dir: str) -> pd.DataFrame:
    """BM25 top-10 documents for a fixed term query
    (stages/textsearch.bm25_topk): one corpus pass emits (doc, term,
    tf, dl) rows for the query terms only; N/avgdl/df are tiny
    aggregates; scoring is block-local (no groupby shuffle); the final
    merge uses the knn-style 4dp comparator.  The reference's only BM25
    is the per-page chunk filter (content_filter_strategy.py) — this is
    the corpus-level retrieval a training-data pipeline needs."""
    from ..stages.textsearch import bm25_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return bm25_topk(ds, "doc_id", "text", ["customer", "vector", "window"], k=10)


_BM25_SQL = """
WITH d AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS w FROM documents
),
stats AS (SELECT COUNT(*) AS n, SUM(len(w)) * 1.0 / COUNT(*) AS avgdl FROM d),
t AS (SELECT doc_id, unnest(w) AS tok, len(w) AS dl FROM d),
tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf, ANY_VALUE(dl) AS dl
  FROM t WHERE tok IN ('customer', 'vector', 'window') GROUP BY doc_id, tok
),
df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok)
SELECT tf.doc_id,
       ROUND(SUM(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                 * tf.tf * (1.2 + 1.0)
                 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / stats.avgdl))), 4) AS bm25
FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN stats
GROUP BY tf.doc_id, stats.n, stats.avgdl
ORDER BY bm25 DESC, tf.doc_id LIMIT 10
"""


def lang_id_counts(sf_dir: str) -> pd.DataFrame:
    """Language-ID (character-bigram profile heuristic,
    functions/textstats.lang_id) over documents: (true lang, predicted
    lang, n) confusion counts.  Fully oracle-checked (r2: rows-only):
    the bigram-set/profile-overlap scoring with alphabetical tie-break
    is expressed in SQL via a list comprehension + list_intersect, with
    the same profile table embedded in the oracle."""
    from ..functions.textstats import lang_id

    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def predict(batch: pa.Table) -> pa.Table:
        preds = [lang_id(t) for t in batch["text"].to_pylist()]
        t = pa.table({"lang": batch["lang"], "pred": pa.array(preds, pa.string())})
        return (
            t.group_by(["lang", "pred"]).aggregate([([], "count_all")]).rename_columns(["lang", "pred", "n"])
        )

    out = partial_grouped_sum(
        ds.map_batches(predict, batch_format="pyarrow"), ["lang", "pred"], sums=["n"]
    ).to_pandas()
    df = pd.DataFrame({"lang": out["lang"], "pred": out["pred"], "n": out["sum_n"].astype("int64")})
    return df.sort_values(["lang", "pred"]).reset_index(drop=True)


def _lang_id_sql() -> str:
    """SQL oracle for lang_id_counts: the exact scoring spec of
    functions/textstats.lang_id (distinct char bigrams ∩ profile /
    |profile|, argmax with alphabetical tie-break, 'und' for blank)."""
    from ..functions.textstats import _LANG_PROFILES

    vals = ",\n  ".join(
        "('%s', [%s])" % (lang, ",".join("'" + g.replace("'", "''") + "'" for g in s.split()))
        for lang, s in sorted(_LANG_PROFILES.items())
    )
    return f"""
WITH profiles(plang, prof) AS (VALUES {vals}),
d AS (SELECT doc_id, lang AS true_lang, lower(text) AS t FROM documents),
g AS (SELECT doc_id, true_lang, t,
             list_distinct([substring(t, i, 2) for i in range(1, length(t))]) AS grams FROM d),
scored AS (
  SELECT doc_id, true_lang, p.plang AS pred,
         CAST(len(list_intersect(grams, p.prof)) AS DOUBLE) / len(p.prof) AS score
  FROM g JOIN profiles p ON TRUE WHERE trim(t) <> ''
),
pick AS (SELECT true_lang, pred,
                ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, pred ASC) AS rn
         FROM scored),
preds AS (SELECT true_lang, pred FROM pick WHERE rn = 1
          UNION ALL
          SELECT true_lang, 'und' FROM d WHERE trim(t) = '')
SELECT true_lang AS lang, pred, COUNT(*) AS n FROM preds GROUP BY 1, 2 ORDER BY 1, 2
"""


_LANG_ID_SQL = _lang_id_sql()


def source_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])
    out = partial_grouped_sum(ds, ["source"], sums=["n_chars"], count_alias="n_docs").to_pandas()
    df = pd.DataFrame(
        {
            "source": out["source"],
            "n_docs": out["n_docs"].astype("int64"),
            "total_chars": out["sum_n_chars"].astype("int64"),
        }
    )
    df["avg_chars"] = (df["total_chars"] / df["n_docs"]).round(4)
    return df.sort_values("source").reset_index(drop=True)


_SOURCE_STATS_SQL = """
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(SUM(n_chars) * 1.0 / COUNT(*), 4) AS avg_chars
FROM documents GROUP BY source ORDER BY source
"""


def normalized_sources(sf_dir: str) -> pd.DataFrame:
    """URL scheme-normalize + slug (M2/M3; tasks.py:343, utils.py:176-180)."""
    ds = _read(sf_dir, "documents", columns=["source"])
    # distributed distinct: per-batch unique -> groupby(source) — the
    # source/host cardinality can be millions at corpus scale, so no
    # driver-side unique() list (scale-shape fix, r2)
    distinct = (
        ds.map_batches(
            lambda t: pa.table({"source": pc.unique(t["source"])}), batch_format="pyarrow"
        )
        .groupby("source")
        .aggregate(Count(alias_name="__c"))
    )

    def norm(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_pylist()
        urls = [normalize_url(s) for s in src]
        slugs = [url_to_slug(u) for u in urls]
        return pa.table(
            {
                "source": batch["source"],
                "url": pa.array(urls, pa.string()),
                "slug": pa.array(slugs, pa.string()),
            }
        )

    out = distinct.map_batches(norm, batch_format="pyarrow").to_pandas()
    return out.sort_values("source").reset_index(drop=True)


_NORM_SOURCES_SQL = """
SELECT DISTINCT source,
       'https://' || source AS url,
       regexp_replace(source, '[^a-zA-Z0-9_-]', '-', 'g') AS slug
FROM documents ORDER BY source
"""


def doc_fingerprints(sf_dir: str) -> pd.DataFrame:
    """Exact content fingerprint per doc (md5; matches DuckDB md5())."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": pa.array(H.md5_hex_many(batch["text"].to_pylist()), pa.string()),
            }
        )

    out = ds.map_batches(fp, batch_format="pyarrow").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


_FINGERPRINT_SQL = """
SELECT doc_id, md5(text) AS fingerprint FROM documents ORDER BY doc_id
"""


def dedup_exact_docs(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = exact_dedup_stats(ds, "doc_id", "text").to_pandas()
    out["keep_doc_id"] = out["keep_doc_id"].astype("int64")
    out["n_copies"] = out["n_copies"].astype("int64")
    return out.sort_values("text_hash").reset_index(drop=True)


_DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text) ORDER BY text_hash
"""


# =========================================================================
# E. Embeddings: similarity search + stats
# =========================================================================

def _load_query_vec(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    row = t.filter(pc.equal(t["vec_id"], 0))
    return np.asarray(row["embedding"].to_pylist()[0], dtype=np.float64)


def knn_cosine_top10(sf_dir: str) -> pd.DataFrame:
    """Brute-force cosine top-k vs the vec_id=0 query (broadcast query,
    per-batch matmul, partial top-k)."""
    q = _load_query_vec(sf_dir)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = brute_force_topk(ds, "vec_id", "embedding", q, k=10, exclude_id=0)
    return out.rename(columns={"cos_sim": "cos_sim"})[["vec_id", "cos_sim"]]


_KNN_SQL = """
SELECT vec_id,
       ROUND(list_cosine_similarity(embedding,
             (SELECT embedding FROM embeddings WHERE vec_id = 0)), 4) AS cos_sim
FROM embeddings WHERE vec_id <> 0
ORDER BY cos_sim DESC, vec_id LIMIT 10
"""


def _seed_centroids(sf_dir: str, nlist: int = 16) -> np.ndarray:
    """Deterministic coarse quantizer for the ORACLE-BACKED query
    surface: centroids = L2-normalized embeddings of vec_ids 1..nlist
    (data rows as seeds, no training).  Because cosine against a
    normalized copy of row j equals cosine against row j itself, the
    whole IVF plan (assign → probe → in-bucket exact scan) is
    re-expressible in SQL via list_cosine_similarity — a real oracle for
    the approximate plan, not just a happens-to-equal-brute-force check.
    The trained k-means quantizer (train_ivf_centroids) remains the
    library scale path and is pytest-pinned (tests/test_stages.py)."""
    import pyarrow.parquet as pq

    from ..stages.knn import _to_matrix

    t = pq.read_table(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    t = t.filter(pc.and_(pc.greater_equal(t["vec_id"], 1), pc.less_equal(t["vec_id"], nlist)))
    t = t.sort_by("vec_id")
    C = _to_matrix(t["embedding"])
    return C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)


def knn_ivf_top10(sf_dir: str) -> pd.DataFrame:
    """IVF-bucketed approximate top-k.  Oracle-backed (r4, was
    rows-only): seeded centroids (_seed_centroids) make the plan —
    nearest-centroid assignment, nprobe-list probe, exact scoring of the
    probed lists — byte-reproducible in DuckDB SQL (_IVF_SQL).  The
    result is honestly approximate (it may differ from brute force; the
    oracle mirrors the PLAN, not the exhaustive answer)."""
    q = _load_query_vec(sf_dir)
    cents = _seed_centroids(sf_dir, nlist=16)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ivf_topk(ds, "vec_id", "embedding", q, cents, k=10, nprobe=4, exclude_id=0)


# SQL mirror of the seeded-centroid IVF plan: assignment = argmax cosine
# vs seed rows 1..16 (ties → smaller list id, same as np.argmax first-
# max), probed lists = top-4 by query·seed cosine, then exact top-10
# inside the probed lists with the standard (round(cos,4) DESC, vec_id)
# comparator.
_IVF_SQL = """
WITH seeds AS (
  SELECT vec_id AS list_id, embedding FROM embeddings WHERE vec_id BETWEEN 1 AND 16
),
qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
assigned AS (
  SELECT vec_id, list_id FROM (
    SELECT e.vec_id, s.list_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.embedding, s.embedding) DESC, s.list_id
           ) AS rn
    FROM embeddings e CROSS JOIN seeds s
  ) WHERE rn = 1
),
probed AS (
  SELECT list_id FROM (
    SELECT s.list_id,
           ROW_NUMBER() OVER (
             ORDER BY list_cosine_similarity(s.embedding, (SELECT q FROM qv)) DESC, s.list_id
           ) AS rn
    FROM seeds s
  ) WHERE rn <= 4
)
SELECT e.vec_id,
       ROUND(list_cosine_similarity(e.embedding, (SELECT q FROM qv)), 4) AS cos_sim
FROM embeddings e
JOIN assigned a USING (vec_id)
WHERE a.list_id IN (SELECT list_id FROM probed) AND e.vec_id <> 0
ORDER BY cos_sim DESC, vec_id LIMIT 10
"""


def knn_ivf_indexed_top10(sf_dir: str) -> pd.DataFrame:
    """IVF with a PERSISTED inverted file: vectors are assigned once and
    written as parquet partitioned by ivf_list (stages/knn.build_ivf_index);
    the query prunes the read to its nprobe probed partitions — the
    build/query split the r1 review asked for (assignment no longer
    recomputed per query).  Oracle-backed (r4, was rows-only): same
    seeded-centroid plan as knn_ivf_top10, so the same _IVF_SQL oracle
    applies; pytest additionally asserts equality with the non-indexed
    plan."""
    import hashlib
    import shutil

    from ..stages.knn import build_ivf_index, ivf_topk_indexed

    q = _load_query_vec(sf_dir)
    cents = _seed_centroids(sf_dir, nlist=16)

    # cache key includes the embeddings file's mtime+size so a regenerated
    # parquet at the same path invalidates the persisted index (and the
    # centroid spec so a quantizer change rebuilds it)
    import os as _os

    emb_path = _p(sf_dir, "embeddings")
    st = _os.stat(emb_path)
    key = f"{sf_dir}|{st.st_mtime_ns}|{st.st_size}|seeded16"
    idx_dir = f"/tmp/dc4r_ivf_index/{hashlib.md5(key.encode()).hexdigest()[:12]}"
    done = f"{idx_dir}/_DONE"

    if not _os.path.exists(done):
        shutil.rmtree(idx_dir, ignore_errors=True)
        ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        build_ivf_index(ds, "vec_id", "embedding", cents, idx_dir)
        open(done, "w").close()
    return ivf_topk_indexed(idx_dir, "vec_id", "embedding", q, cents, k=10, nprobe=4, exclude_id=0)


def knn_ivf_appended_top10(sf_dir: str) -> pd.DataFrame:
    """IVF index built INCREMENTALLY (stages/knn.append_ivf_index): even
    vec_ids indexed first, odd vec_ids appended with the centroids the
    build persisted (faiss add-after-train) — the recrawl-embedding
    update path.  Same seeded-centroid plan as knn_ivf_top10, so the
    same _IVF_SQL oracle applies: segment append must not change one
    row vs indexing everything at once."""
    import hashlib
    import os as _os
    import shutil

    from ..stages.knn import append_ivf_index, build_ivf_index, ivf_topk_indexed

    q = _load_query_vec(sf_dir)
    cents = _seed_centroids(sf_dir, nlist=16)
    emb_path = _p(sf_dir, "embeddings")
    st = _os.stat(emb_path)
    key = f"append|{sf_dir}|{st.st_mtime_ns}|{st.st_size}|seeded16"
    idx_dir = f"/tmp/dc4r_ivf_index/{hashlib.md5(key.encode()).hexdigest()[:12]}"
    done = f"{idx_dir}/_DONE"

    if not _os.path.exists(done):
        shutil.rmtree(idx_dir, ignore_errors=True)
        ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

        def parity(keep_odd: int):
            def fn(t: pa.Table) -> pa.Table:
                return t.filter(pc.equal(pc.bit_wise_and(t["vec_id"], 1), keep_odd))

            return fn

        build_ivf_index(
            ds.map_batches(parity(0), batch_format="pyarrow"),
            "vec_id", "embedding", cents, idx_dir,
        )
        append_ivf_index(
            idx_dir, ds.map_batches(parity(1), batch_format="pyarrow"),
            "vec_id", "embedding",
        )
        open(done, "w").close()
    # centroids=None: load the persisted quantizer — the self-contained path
    return ivf_topk_indexed(
        idx_dir, "vec_id", "embedding", q, None, k=10, nprobe=4, exclude_id=0
    )


def knn_pq_top10(sf_dir: str) -> pd.DataFrame:
    """Product-quantization ANN (stages/knn.train_pq/pq_encode/pq_topk):
    the scan index holds 8 BYTES per vector (64× smaller than float64),
    scanned via an asymmetric-distance LUT; the top-256 ADC candidates
    are re-ranked EXACTLY against the full-precision column.  Values
    are exact, the id set is approximate (like IVF): on this corpus's
    weak-neighbor embeddings the ADC prescreen misses true neighbors
    once N ≫ refine (measured at sf0.1), so there is deliberately NO
    exact-SQL oracle — correctness is pinned by pytest instead
    (refine≥N ⇒ byte-identical to brute force; recall@10 bound at
    refine=256; deterministic: seeded codebooks, no query-time RNG)."""
    import pyarrow.parquet as pq

    from ..stages.knn import _to_matrix, pq_encode, pq_topk, train_pq

    q = _load_query_vec(sf_dir)
    sample = pq.read_table(_p(sf_dir, "embeddings"), columns=["embedding"])
    M = _to_matrix(sample["embedding"].slice(0, 2048))
    books = train_pq(M, m=8, k=64, iters=5)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    codes = pq_encode(ds, "vec_id", "embedding", books)
    return pq_topk(codes, ds, "vec_id", "embedding", q, books, k=10, refine=256, exclude_id=0)


def knn_pq_refine_all(sf_dir: str) -> pd.DataFrame:
    """PQ with refine ≥ N: the ADC prescreen keeps every id, so the
    exact float64 re-rank IS the brute-force answer — the oracle-backed
    twin of knn_pq_top10 (r4, per the r3 verdict): the whole
    encode→ADC-scan→refine machinery runs and is hash-checked against
    the brute-force SQL; knn_pq_top10 (refine=256) stays rows-only as
    the honestly-approximate configuration."""
    import pyarrow.parquet as pq

    from ..stages.knn import _to_matrix, pq_encode, pq_topk, train_pq

    q = _load_query_vec(sf_dir)
    sample = pq.read_table(_p(sf_dir, "embeddings"), columns=["embedding"])
    M = _to_matrix(sample["embedding"].slice(0, 2048))
    books = train_pq(M, m=8, k=64, iters=5)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    codes = pq_encode(ds, "vec_id", "embedding", books)
    return pq_topk(codes, ds, "vec_id", "embedding", q, books, k=10, refine=1 << 31, exclude_id=0)


def embedding_label_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])

    def first_comp(batch: pa.Table) -> pa.Table:
        first = pc.list_element(batch["embedding"], 0)
        return pa.table({"label": batch["label"], "e0": pc.cast(first, pa.float64())})

    out = partial_grouped_sum(
        ds.map_batches(first_comp, batch_format="pyarrow"), ["label"], sums=["e0"], count_alias="n"
    ).to_pandas()
    df = pd.DataFrame(
        {
            "label": out["label"].astype("int32"),
            "n": out["n"].astype("int64"),
            "avg_first": (out["sum_e0"] / out["n"]).round(4),
        }
    )
    return df.sort_values("label").reset_index(drop=True)


_EMB_STATS_SQL = """
SELECT label, COUNT(*) AS n, ROUND(SUM(CAST(embedding[1] AS DOUBLE)) / COUNT(*), 4) AS avg_first
FROM embeddings GROUP BY label ORDER BY label
"""


def embedding_near_dup_pairs(sf_dir: str) -> "rd.Dataset":
    """Embedding-cosine near-dup pairs at threshold 0.95 via SRP-LSH
    banding (stages/dedup.srp_near_dup_pairs — bucketed, no driver-side
    matrix).  Planted near-dups: every vec_id % 50 == 0 gains a copy
    (vec_id + 10_000_000) with its first component perturbed
    (2·v₀ → 1.01·v₀ + 0.001 — cos ≈ 1.0 but bytes differ), so the
    operator demonstrably returns rows; the same plant is expressed in
    the SQL oracle, making this fully hash-checked despite LSH (recall
    miss prob ≈ 1.5e-8 per pair at the threshold)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def plant(batch: pa.Table) -> pa.Table:
        from ..stages.knn import _to_matrix

        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % 50 == 0))
        V = _to_matrix(sub["embedding"]).astype(np.float64, copy=False)
        if V.size:
            V = V.copy()
            V[:, 0] = V[:, 0] * 1.01 + 0.001
        return pa.table(
            {
                "vec_id": pc.add(sub["vec_id"], 10_000_000),
                "embedding": pa.array(list(V), pa.list_(pa.float64())),
            }
        )

    def widen(batch: pa.Table) -> pa.Table:
        # unify dtype with the planted branch (float32 parquet → float64)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "embedding": pc.cast(batch["embedding"], pa.list_(pa.float64())),
            }
        )

    aug = ds.map_batches(widen, batch_format="pyarrow").union(
        ds.map_batches(plant, batch_format="pyarrow")
    )
    return srp_near_dup_pairs(aug, "vec_id", "embedding", threshold=0.95, payload_mode="auto")


_EMB_NEAR_DUP_SQL = """
WITH aug AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 10000000,
         list_prepend(CAST(embedding[1] AS DOUBLE) * 1.01 + 0.001,
                      CAST(embedding[2:] AS DOUBLE[]))
  FROM embeddings WHERE vec_id % 50 = 0
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.e, b.e), 4) AS cos_sim
FROM aug a JOIN aug b ON b.vec_id > a.vec_id
WHERE ROUND(list_cosine_similarity(a.e, b.e), 4) >= 0.95
ORDER BY id_a, id_b
"""


def _kmeans_seed_init(sf_dir: str, k: int = 8) -> np.ndarray:
    """k-means init for the ORACLE-BACKED queries: the RAW (unrounded,
    un-normalized) embeddings of vec_ids 1..k, so the SQL twin's c0 CTE
    is literally the same data rows (cosine assignment is
    scale-invariant, so normalization is unnecessary)."""
    import pyarrow.parquet as pq

    from ..stages.knn import _to_matrix

    t = pq.read_table(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    t = t.filter(pc.and_(pc.greater_equal(t["vec_id"], 1), pc.less_equal(t["vec_id"], k)))
    return _to_matrix(t.sort_by("vec_id")["embedding"])


def _unrolled_kmeans_sql(src: str, k: int, iters: int) -> str:
    """CTE chain mirroring stages/semdedup.kmeans_fit bit-for-bit (the
    pagerank-oracle unrolling trick): c0 = raw seed rows, each round =
    (assignment: argmax ROUND(cos,4), ties -> smaller cluster) then
    (update: per-dim AVG ROUNDed to 6dp, empty clusters keep their old
    centroid), and `af` is the final assignment against c{iters}.
    ``src`` must be a CTE named `e` exposing (vec_id, v DOUBLE[])."""
    parts = [
        f"c0 AS (SELECT vec_id - 1 AS cl, v AS c FROM {src} "
        f"WHERE vec_id BETWEEN 1 AND {k})"
    ]

    def assign(name: str, cents: str) -> str:
        return f"""{name} AS (SELECT vec_id, cl FROM (
  SELECT e.vec_id, c.cl,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
           ORDER BY ROUND(list_cosine_similarity(e.v, c.c), 4) DESC, c.cl) AS rn
  FROM {src} e CROSS JOIN {cents} c) WHERE rn = 1)"""

    for t in range(iters):
        parts.append(assign(f"a{t}", f"c{t}"))
        parts.append(
            f"""m{t} AS (SELECT cl, i, ROUND(AVG(x), 6) AS x FROM (
  SELECT a.cl, generate_subscripts(e.v, 1) AS i, unnest(e.v) AS x
  FROM {src} e JOIN a{t} a USING (vec_id)) GROUP BY cl, i)"""
        )
        parts.append(
            f"n{t} AS (SELECT cl, list(x ORDER BY i) AS c FROM m{t} GROUP BY cl)"
        )
        parts.append(
            f"c{t + 1} AS (SELECT c.cl, COALESCE(n.c, c.c) AS c "
            f"FROM c{t} c LEFT JOIN n{t} n USING (cl))"
        )
    parts.append(assign("af", f"c{iters}"))
    return ",\n".join(parts)


def kmeans_clusters(sf_dir: str) -> pd.DataFrame:
    """Distributed Lloyd k-means over the embeddings (k=8, 3 rounds,
    seeds = vec_ids 1..8): centroids broadcast per round, k slim partial
    rows per block, driver holds only the k x d matrix.  Output is the
    final (vec_id, cluster) assignment — the training LOOP itself is
    oracle-checked via the unrolled-CTE twin."""
    from ..stages.semdedup import assign_clusters, kmeans_fit

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    C = kmeans_fit(ds, "embedding", _kmeans_seed_init(sf_dir, 8), iters=3)
    df = assign_clusters(ds, "vec_id", "embedding", C).to_pandas()
    df = df.sort_values("vec_id").reset_index(drop=True)
    for c in ("vec_id", "cluster"):
        df[c] = df[c].astype("int64")
    return df


_KMEANS_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
{_unrolled_kmeans_sql("e", 8, 3)}
SELECT vec_id, cl AS cluster FROM af ORDER BY vec_id
"""


def _aug_embeddings(sf_dir: str) -> "rd.Dataset":
    """embeddings ∪ planted near-identical copies (vec_id % 50 == 0 →
    vec_id + 10M with the first component scaled 1.01 + 0.001) — the
    same plant as emb_near_dup_pairs, giving semdedup a recoverable dup
    population; everything widened to list<double> so both branches and
    the SQL aug CTE hold identical values."""

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def widen(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "embedding": pc.cast(batch["embedding"], pa.list_(pa.float64())),
            }
        )

    def plant(batch: pa.Table) -> pa.Table:
        from ..stages.knn import _to_matrix

        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % 50 == 0))
        X = _to_matrix(sub["embedding"])  # float64
        if len(X):
            X = X.copy()
            X[:, 0] = X[:, 0] * 1.01 + 0.001
        return pa.table(
            {
                "vec_id": pc.add(sub["vec_id"], 10_000_000),
                "embedding": pa.array([r.tolist() for r in X], pa.list_(pa.float64())),
            }
        )

    return ds.map_batches(widen, batch_format="pyarrow").union(
        ds.map_batches(plant, batch_format="pyarrow")
    )


def semdedup_docs(sf_dir: str) -> pd.DataFrame:
    """SemDeDup (Abbas et al. 2023) over embeddings ∪ planted
    near-copies: k-means (k=8, 2 rounds) bounds the pairwise step to
    within-cluster, then every row with a smaller-id same-cluster
    neighbor at ROUND(cos,4) >= 0.95 is dropped.  Training, assignment
    AND the keep/drop pass are all under one unrolled SQL oracle."""
    from ..stages.semdedup import kmeans_fit, semantic_dedup

    aug = _aug_embeddings(sf_dir)
    C = kmeans_fit(aug, "embedding", _kmeans_seed_init(sf_dir, 8), iters=2)
    out = semantic_dedup(aug, "vec_id", "embedding", C, threshold=0.95)
    df = out.to_pandas().sort_values("vec_id").reset_index(drop=True)
    for c in ("vec_id", "cluster", "kept"):
        df[c] = df[c].astype("int64")
    return df


_SEMDEDUP_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 10000000,
         list_prepend(CAST(embedding[1] AS DOUBLE) * 1.01 + 0.001,
                      CAST(embedding[2:] AS DOUBLE[]))
  FROM embeddings WHERE vec_id % 50 = 0
),
{_unrolled_kmeans_sql("e", 8, 2)},
drops AS (
  SELECT DISTINCT b.vec_id
  FROM af a JOIN af b ON a.cl = b.cl AND b.vec_id > a.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
  WHERE ROUND(list_cosine_similarity(ea.v, eb.v), 4) >= 0.95
)
SELECT vec_id, cl AS cluster,
       CAST(CASE WHEN vec_id IN (SELECT vec_id FROM drops)
            THEN 0 ELSE 1 END AS BIGINT) AS kept
FROM af ORDER BY vec_id
"""


def semdedup_reps(sf_dir: str) -> pd.DataFrame:
    """SemDeDup with the PAPER's keep rule (Abbas et al. 2023 §2): per
    connected component of the within-cluster >=0.95 graph, keep exactly
    the member with the LOWEST rounded centroid similarity (the least
    prototypical example), ties -> smaller id.  Same augmented input /
    trained k-means as semdedup_docs."""
    from ..stages.semdedup import kmeans_fit, semantic_dedup

    aug = _aug_embeddings(sf_dir)
    C = kmeans_fit(aug, "embedding", _kmeans_seed_init(sf_dir, 8), iters=2)
    out = semantic_dedup(
        aug, "vec_id", "embedding", C, threshold=0.95, keep="low_centroid_sim"
    )
    df = out.to_pandas().sort_values("vec_id").reset_index(drop=True)
    for c in ("vec_id", "cluster", "kept"):
        df[c] = df[c].astype("int64")
    return df


_SEMDEDUP_REPS_SQL = f"""
WITH RECURSIVE e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 10000000,
         list_prepend(CAST(embedding[1] AS DOUBLE) * 1.01 + 0.001,
                      CAST(embedding[2:] AS DOUBLE[]))
  FROM embeddings WHERE vec_id % 50 = 0
),
{_unrolled_kmeans_sql("e", 8, 2)},
cs AS (
  SELECT a.vec_id, a.cl,
         ROUND(list_cosine_similarity(e.v, c.c), 4) AS csim
  FROM af a JOIN e ON e.vec_id = a.vec_id JOIN c2 c ON c.cl = a.cl
),
prs AS (
  SELECT a.vec_id AS ida, b.vec_id AS idb
  FROM af a JOIN af b ON a.cl = b.cl AND b.vec_id > a.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
  WHERE ROUND(list_cosine_similarity(ea.v, eb.v), 4) >= 0.95
),
sym AS (SELECT ida AS a, idb AS b FROM prs UNION ALL SELECT idb, ida FROM prs),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a
),
lbl AS (SELECT a AS v, LEAST(a, MIN(b)) AS lbl FROM reach GROUP BY a),
pick AS (
  SELECT v FROM (
    SELECT l.v, ROW_NUMBER() OVER (
        PARTITION BY l.lbl ORDER BY cs.csim ASC, l.v ASC) AS rn
    FROM lbl l JOIN cs ON cs.vec_id = l.v) WHERE rn = 1
)
SELECT af.vec_id, af.cl AS cluster,
       CAST(CASE WHEN af.vec_id NOT IN (SELECT v FROM lbl) THEN 1
                 WHEN af.vec_id IN (SELECT v FROM pick) THEN 1
                 ELSE 0 END AS BIGINT) AS kept
FROM af ORDER BY vec_id
"""


def knn_join_top5(sf_dir: str) -> pd.DataFrame:
    """ANN kNN-JOIN (batched ivf_topk): queries = every 25th vector,
    base = the rest; both sides cluster-partitioned once (queries
    replicated nprobe=2 ways), per-cluster query x member cosine blocks,
    slim per-qid top-k merge.  The whole approximate PLAN is mirrored in
    SQL (seeded centroids, same rounding/tie rules), like _IVF_SQL."""
    from ..stages.knn import knn_join

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def qside(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % 25 == 0))
        return pa.table({"qid": sub["vec_id"], "embedding": sub["embedding"]})

    def bside(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 25 != 0))

    out = knn_join(
        ds.map_batches(bside, batch_format="pyarrow"),
        ds.map_batches(qside, batch_format="pyarrow"),
        "vec_id",
        "qid",
        "embedding",
        _kmeans_seed_init(sf_dir, 8),
        k=5,
        nprobe=2,
    )
    df = out.to_pandas().sort_values(["qid", "vec_id"]).reset_index(drop=True)
    for c in ("qid", "vec_id"):
        df[c] = df[c].astype("int64")
    return df[["qid", "vec_id", "cos_sim"]]


_KNN_JOIN_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cents AS (SELECT vec_id - 1 AS cl, v AS c FROM e WHERE vec_id BETWEEN 1 AND 8),
q AS (SELECT vec_id AS qid, v FROM e WHERE vec_id % 25 = 0),
b AS (SELECT vec_id, v FROM e WHERE vec_id % 25 <> 0),
ab AS (SELECT vec_id, cl FROM (
    SELECT b.vec_id, c.cl, ROW_NUMBER() OVER (PARTITION BY b.vec_id
      ORDER BY ROUND(list_cosine_similarity(b.v, c.c), 4) DESC, c.cl) AS rn
    FROM b CROSS JOIN cents c) WHERE rn = 1),
aq AS (SELECT qid, cl FROM (
    SELECT q.qid, c.cl, ROW_NUMBER() OVER (PARTITION BY q.qid
      ORDER BY ROUND(list_cosine_similarity(q.v, c.c), 4) DESC, c.cl) AS rn
    FROM q CROSS JOIN cents c) WHERE rn <= 2),
cand AS (
  SELECT aq.qid, ab.vec_id,
         ROUND(list_cosine_similarity(qe.v, be.v), 4) AS cos_sim
  FROM aq JOIN ab ON aq.cl = ab.cl
  JOIN q qe ON qe.qid = aq.qid
  JOIN b be ON be.vec_id = ab.vec_id
)
SELECT qid, vec_id, cos_sim FROM (
  SELECT cand.*, ROW_NUMBER() OVER (PARTITION BY qid
           ORDER BY cos_sim DESC, vec_id) AS rn
  FROM cand) WHERE rn <= 5
ORDER BY qid, vec_id
"""


def source_disjoint_split(sf_dir: str) -> pd.DataFrame:
    """Leakage-free 80/10/10 split of documents keyed by `source`: every
    document of a source lands in the same split (map-side hash-interval
    assignment, zero shuffles) — the standard guard against one site's
    near-duplicates straddling train and eval."""
    from ..stages.sample import keyed_split

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    out = keyed_split(ds, "source", {"train": 0.8, "val": 0.1, "test": 0.1})
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df["doc_id"] = df["doc_id"].astype("int64")
    return df[["doc_id", "source", "split"]]


def _split_sql() -> str:
    # the SQL literals are generated by the SAME numpy bound computation
    # keyed_split uses (cumsum in float64, floor to 2^63 range), so the
    # two engines compare against bit-identical integers
    fracs = np.array([0.8, 0.1, 0.1])
    b = np.floor(np.cumsum(fracs) * float(2**63)).astype(np.uint64)
    return f"""
SELECT doc_id, source,
       CASE WHEN h < {int(b[0])} THEN 'train'
            WHEN h < {int(b[1])} THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, source,
             CAST(md5_number_lower(COALESCE(source, '')) & 9223372036854775807
                  AS BIGINT) AS h
      FROM documents)
ORDER BY doc_id
"""


_SPLIT_SQL = _split_sql()


# =========================================================================
# F. Near-dup text dedup (rows-only: not SQL-expressible)
# =========================================================================

def _augmented_docs(sf_dir: str) -> "rd.Dataset":
    """documents ∪ perturbed copies: each doc with doc_id % 10 == 0 gets
    a copy (doc_id + 10_000_000) with its last word dropped — planting a
    near-dup population whose recovery is oracle-verifiable."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def perturb(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % 10 == 0))
        texts = [" ".join(t.split(" ")[:-1]) for t in sub["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": pc.add(sub["doc_id"], 10_000_000),
                "text": pa.array(texts, pa.string()),
            }
        )

    return ds.union(ds.map_batches(perturb, batch_format="pyarrow"))


def minhash_near_dups(sf_dir: str) -> "rd.Dataset":
    """MinHash+LSH near-dup pairs over documents ∪ perturbed copies,
    with candidates verified by EXACT shingle-set Jaccard inside the
    bucket — so the result equals the exact all-pairs answer (LSH miss
    prob ≈ 4e-8/pair at threshold 0.9) and is hash-checked against a
    DuckDB all-pairs word-3-shingle Jaccard oracle (r1: rows-only)."""
    return minhash_lsh_pairs(
        _augmented_docs(sf_dir),
        "doc_id",
        "text",
        threshold=0.9,
        num_perm=64,
        bands=16,
        k=3,
        verify="exact",
        # candidates ≪ docs here: auto picks the broadcast verify path
        # (zero join shuffles; join-path bloom prune measured 16.5 s →
        # 6.9 s, broadcast cuts the two remaining join sorts too)
        payload_mode="auto",
    )


# word-3-shingle jaccard over documents ∪ perturbed copies.  Tokens =
# regexp \w+ on lower(text) (identical to functions.hashing.tokens for
# this ASCII corpus; RE2 \w is ASCII — python \w is unicode, so non-ascii
# corpora would need [a-z0-9_] pinned on both sides).  NOTE: this oracle
# (like the embedding all-pairs one) is O(N²) SQL by design — it is the
# exactness reference at the sf0.01 driver-gate scale; the ENGINE side
# stays O(LSH candidates) and runs sf0.1 in ~7 s.
_MINHASH_PAIRS_SQL = """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id,
         array_to_string((string_split(text, ' '))[1:len(string_split(text, ' '))-1], ' ') AS text
  FROM documents WHERE doc_id % 10 = 0
),
w AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS w FROM aug),
sh AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w)-1)])
              ELSE [array_to_string(w, ' ')] END AS s
  FROM w WHERE len(w) >= 1
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(a.s || b.s)), 4) AS jac
FROM sh a JOIN sh b ON b.doc_id > a.doc_id
WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      / len(list_distinct(a.s || b.s)) >= 0.9
ORDER BY id_a, id_b
"""


def minhash_dup_clusters(sf_dir: str) -> "rd.Dataset":
    """Near-dup pairs → duplicate clusters via distributed min-label
    propagation (labels live as a Dataset, hash-joined per round).
    Oracle: recursive-CTE transitive closure over the same exact-Jaccard
    pair set (r1: rows-only)."""
    from ..stages.dedup import connected_components

    pairs = minhash_near_dups(sf_dir)
    return connected_components(pairs)


_MINHASH_CLUSTERS_SQL = """
WITH RECURSIVE aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id,
         array_to_string((string_split(text, ' '))[1:len(string_split(text, ' '))-1], ' ') AS text
  FROM documents WHERE doc_id % 10 = 0
),
w AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS w FROM aug),
sh AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w)-1)])
              ELSE [array_to_string(w, ' ')] END AS s
  FROM w WHERE len(w) >= 1
),
edges AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON b.doc_id > a.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / len(list_distinct(a.s || b.s)) >= 0.9
),
sym AS (SELECT id_a AS a, id_b AS b FROM edges UNION SELECT id_b, id_a FROM edges),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a
)
SELECT a AS node, LEAST(a, MIN(b)) AS component
FROM reach GROUP BY a ORDER BY node
"""


def clean_corpus_stats(sf_dir: str) -> pd.DataFrame:
    """End-to-end training-data cleaning pipeline: exact-dedup (keep min
    doc_id per md5), token-count filter (≥ 20 tokens), per-lang counts.
    The composition is SQL-expressible, so the whole multi-stage
    pipeline is oracle-checked."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    # dedup winners stay a DATASET; the keep-set is applied by a bucketed
    # hash semi-join, not a driver-materialized broadcast list (r1 review
    # finding #6) — at 10^9 docs the winner set never fits the driver
    keep_ds = exact_dedup_stats(ds, "doc_id", "text").map_batches(
        lambda t: pa.table({"keep_doc_id": t["keep_doc_id"]}), batch_format="pyarrow"
    )

    def tok_filter(batch: pa.Table) -> pa.Table:
        n = pc.add(pc.count_substring(batch["text"], " "), 1)
        sub = batch.filter(pc.greater_equal(n, 20))
        return sub.select(["doc_id", "lang"])  # drop payload before the join shuffle

    filtered = ds.map_batches(tok_filter, batch_format="pyarrow")
    kept = hash_join(filtered, keep_ds, on="doc_id", right_on="keep_doc_id", num_buckets=16)
    out = partial_grouped_sum(kept, ["lang"], count_alias="n_docs").to_pandas()
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


_CLEAN_SQL = """
WITH keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text))
SELECT lang, COUNT(*) AS n_docs
FROM documents
WHERE doc_id IN (SELECT doc_id FROM keep)
  AND length(text) - length(replace(text, ' ', '')) + 1 >= 20
GROUP BY lang ORDER BY lang
"""


def simhash_near_dups(sf_dir: str) -> pd.DataFrame:
    """SimHash Hamming-ball near-dup pairs over documents ∪ perturbed
    copies (the same planted population as minhash_near_dups).  Banded
    candidates (4×16-bit chunks, 100 % recall for hamming ≤ 3), exact
    XOR+popcount verify.  Oracle-backed (r4, was rows-only): the query
    surface uses the md5 token-hash spec (token_hashes_md5 ≡ DuckDB
    md5_number_lower), so an all-pairs SQL simhash recomputation is the
    exactness reference; the banded plan itself is additionally pinned
    by a brute-force equality test (tests/test_stages.py)."""
    from ..stages.dedup import simhash_near_dup_pairs

    out = simhash_near_dup_pairs(
        _augmented_docs(sf_dir), "doc_id", "text", max_hamming=3, token_hasher=H.token_hashes_md5
    ).to_pandas()
    out["hamming"] = out["hamming"].astype("int64")
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def simhash_signatures(sf_dir: str) -> pd.DataFrame:
    """SimHash64 per doc as a hex string, md5 token-hash spec —
    oracle-backed (r4, was rows-only): DuckDB rebuilds the identical
    signature from md5_number_lower per token + bit-vote SQL.  The fast
    siphash spec (H.token_hashes) remains the hot-path default in
    stages/dedup.simhash_stage."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(
        simhash_stage("doc_id", "text", token_hasher=H.token_hashes_md5), batch_format="pyarrow"
    ).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["simhash_hex"] = out["simhash"].astype("uint64").map(lambda v: f"{v:016x}")
    return out[["doc_id", "simhash_hex"]].sort_values("doc_id").reset_index(drop=True)


# SimHash in SQL: per-token 64-bit hash = md5_number_lower(tok) (engine
# side: functions/hashing.token_hashes_md5 — digest bytes [8:16] LE,
# verified byte-identical), per-bit ±1 vote over all token occurrences,
# bit set iff vote > 0 (strict majority — ties clear the bit, matching
# simhash64's ones*2 > n).  \\w+ on lower(text) tokenizes identically on
# this ASCII corpus (see _MINHASH_PAIRS_SQL note).
_SIMHASH_SIG_CTE = """
toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS tok FROM {src}),
th AS (SELECT doc_id, md5_number_lower(tok) AS h FROM toks),
bits AS (
  SELECT doc_id, b AS bit, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM th, (SELECT unnest(range(64)) AS b) GROUP BY doc_id, b
),
sig AS (
  SELECT doc_id, SUM(CASE WHEN vote > 0 THEN (1::HUGEINT << bit) ELSE 0::HUGEINT END) AS s
  FROM bits GROUP BY doc_id
)
"""

_SIMHASH_SIG_SQL = (
    "WITH " + _SIMHASH_SIG_CTE.format(src="documents") + """
SELECT d.doc_id, lpad(lower(hex(COALESCE(s, 0)::UBIGINT)), 16, '0') AS simhash_hex
FROM documents d LEFT JOIN sig USING (doc_id) ORDER BY doc_id
"""
)

# all-pairs Hamming over the augmented population — O(N²) SQL by design
# (exactness reference at gate scale); engine side stays O(banded
# candidates).
_SIMHASH_PAIRS_SQL = (
    """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id,
         array_to_string((string_split(text, ' '))[1:len(string_split(text, ' '))-1], ' ') AS text
  FROM documents WHERE doc_id % 10 = 0
),
"""
    + _SIMHASH_SIG_CTE.format(src="aug")
    + """,
full_sig AS (
  SELECT a.doc_id, COALESCE(s, 0)::UBIGINT AS s FROM aug a LEFT JOIN sig USING (doc_id)
)
SELECT x.doc_id AS id_a, y.doc_id AS id_b, bit_count(xor(x.s, y.s))::BIGINT AS hamming
FROM full_sig x JOIN full_sig y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.s, y.s)) <= 3
ORDER BY id_a, id_b
"""
)


# =========================================================================
# G. Multimodal (stubbed decode, real Ray plumbing)
# =========================================================================

def image_decode_meta(sf_dir: str) -> pd.DataFrame:
    """Binary payload column → decode metadata via an actor-pool stage.

    The 'image' payload is the utf-8 text bytes (deterministic stand-in;
    the decode stub derives dims from byte length → oracle-exact)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_payload(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload": pc.cast(batch["text"], pa.binary()),
            }
        )

    out = (
        ds.map_batches(to_payload, batch_format="pyarrow")
        .map_batches(
            ImageDecodeStage,
            fn_constructor_args=("payload", "doc_id"),
            batch_format="pyarrow",
            batch_size=256,  # small batches: binary payload discipline
            concurrency=(1, 4),
        )
        .to_pandas()
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


_IMAGE_DECODE_SQL = """
SELECT doc_id,
       (octet_length(encode(text)) * 7) % 640 + 16  AS width,
       (octet_length(encode(text)) * 13) % 480 + 16 AS height,
       octet_length(encode(text))                   AS n_bytes
FROM documents ORDER BY doc_id
"""


_FRAME_SAMPLES_SQL = """
WITH f AS (
  SELECT doc_id, GREATEST(1, octet_length(encode(text)) // 64) AS n_frames
  FROM documents
)
SELECT doc_id, j AS frame_idx, j * GREATEST(1, n_frames // 4) AS frame_offset
FROM f, UNNEST(range(LEAST(4, n_frames))) AS u(j)
ORDER BY doc_id, frame_idx
"""


def frame_samples(sf_dir: str) -> pd.DataFrame:
    """Frame-sampling stage over binary 'video' payloads.  The stub's
    frame arithmetic is pure → fully oracle-checked (r1: rows-only)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_payload(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch["doc_id"], "payload": pc.cast(batch["text"], pa.binary())}
        )

    out = (
        ds.map_batches(to_payload, batch_format="pyarrow")
        .map_batches(
            FrameSampleStage,
            fn_constructor_args=("payload", "doc_id", 4),
            batch_format="pyarrow",
            batch_size=256,
            concurrency=(1, 4),
        )
        .to_pandas()
    )
    return out.sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)


def image_resize_meta(sf_dir: str) -> pd.DataFrame:
    """Resize stage over binary 'image' payloads: the resized BINARY
    column flows through the pipeline (real payload plumbing); the query
    returns the byte-identity metadata so the oracle pins the transform
    (md5 of the resized payload) exactly."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_payload(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch["doc_id"], "payload": pc.cast(batch["text"], pa.binary())}
        )

    out = (
        ds.map_batches(to_payload, batch_format="pyarrow")
        .map_batches(
            ImageResizeStage,
            fn_constructor_args=("payload", "doc_id", 64, 64),
            batch_format="pyarrow",
            batch_size=256,  # small batches: binary payload discipline
            concurrency=(1, 4),
        )
        .select_columns(["doc_id", "out_w", "out_h", "n_bytes_in", "n_bytes_out", "resized_md5"])
        .to_pandas()
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


_IMAGE_RESIZE_SQL = """
SELECT doc_id,
       64::BIGINT AS out_w,
       64::BIGINT AS out_h,
       octet_length(encode(text)) AS n_bytes_in,
       octet_length(encode(substring(text, 1, 256))) AS n_bytes_out,
       md5(substring(text, 1, 256)) AS resized_md5
FROM documents ORDER BY doc_id
"""


def audio_window_features(sf_dir: str) -> pd.DataFrame:
    """Audio feature-extraction stage: binary payload → 4 codepoint
    windows → md5-derived feature per window (deterministic stand-in for
    MFCC/RMS; kernel is SQL-expressible so the oracle is exact)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_payload(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch["doc_id"], "payload": pc.cast(batch["text"], pa.binary())}
        )

    out = (
        ds.map_batches(to_payload, batch_format="pyarrow")
        .map_batches(
            AudioFeatureStage,
            fn_constructor_args=("payload", "doc_id", 4),
            batch_format="pyarrow",
            batch_size=256,
            concurrency=(1, 4),
        )
        .to_pandas()
    )
    return out.sort_values(["doc_id", "window_idx"]).reset_index(drop=True)


_AUDIO_FEATURES_SQL = """
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
w AS (
  SELECT doc_id, j AS window_idx,
         substring(text, (j * n) // 4 + 1, ((j + 1) * n) // 4 - (j * n) // 4) AS win
  FROM d, UNNEST(range(4)) AS u(j)
  WHERE ((j + 1) * n) // 4 > (j * n) // 4
)
SELECT doc_id, window_idx,
       ROUND(CAST(('0x' || substring(md5(win), 1, 8)) AS UBIGINT) / 4294967296.0, 6) AS feature
FROM w ORDER BY doc_id, window_idx
"""


def parts_by_brand(sf_dir: str) -> pd.DataFrame:
    """Grouped stats over part (brand rollup, partial-agg pattern)."""
    ds = _read(sf_dir, "part", columns=["p_brand", "p_retailprice", "p_size"])
    out = partial_grouped_sum(
        ds, ["p_brand"], sums=["p_retailprice"], count_alias="n_parts", maxs=["p_size"]
    ).to_pandas()
    df = pd.DataFrame(
        {
            "p_brand": out["p_brand"],
            "n_parts": out["n_parts"].astype("int64"),
            "avg_price": (out["sum_p_retailprice"] / out["n_parts"]).round(4),
            "max_size": out["max_p_size"].astype("int64"),
        }
    )
    return df.sort_values("p_brand").reset_index(drop=True)


_PARTS_SQL = """
SELECT p_brand, COUNT(*) AS n_parts,
       ROUND(SUM(p_retailprice) / COUNT(*), 4) AS avg_price,
       CAST(MAX(p_size) AS BIGINT) AS max_size
FROM part GROUP BY p_brand ORDER BY p_brand
"""


def supplier_balance_by_nation(sf_dir: str) -> pd.DataFrame:
    """supplier ⋈ nation (broadcast dimension) → per-nation balances."""
    import pyarrow.parquet as pq

    nation = pq.read_table(_p(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    lut_ref = ray.put((nation["n_nationkey"].combine_chunks(), nation["n_name"].combine_chunks()))

    def add_nation(batch: pa.Table) -> pa.Table:
        keys, vals = ray.get(lut_ref)
        idx = pc.index_in(batch["s_nationkey"], value_set=keys)
        return pa.table({"n_name": pc.take(vals, idx), "s_acctbal": batch["s_acctbal"]})

    ds = _read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])
    out = partial_grouped_sum(
        ds.map_batches(add_nation, batch_format="pyarrow"), ["n_name"], sums=["s_acctbal"], count_alias="n_suppliers"
    ).to_pandas()
    df = pd.DataFrame(
        {
            "n_name": out["n_name"],
            "n_suppliers": out["n_suppliers"].astype("int64"),
            "total_acctbal": out["sum_s_acctbal"].round(2),
        }
    )
    return df.sort_values("n_name").reset_index(drop=True)


_SUPPLIER_SQL = """
SELECT n_name, COUNT(*) AS n_suppliers, ROUND(SUM(s_acctbal), 2) AS total_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def props_k_stats(sf_dir: str) -> pd.DataFrame:
    """JSON field extraction from the events ``props`` column (M13 JSON
    handling made columnar): per event_type stats of props.k."""
    import json as _json

    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def extract_k(batch: pa.Table) -> pa.Table:
        ks = np.fromiter(
            (_json.loads(p).get("k", 0) for p in batch["props"].to_pylist()),
            dtype=np.int64,
            count=len(batch),
        )
        return pa.table({"event_type": batch["event_type"], "k": pa.array(ks)})

    out = partial_grouped_sum(
        ds.map_batches(extract_k, batch_format="pyarrow"), ["event_type"], sums=["k"], count_alias="n", maxs=["k"]
    ).to_pandas()
    df = pd.DataFrame(
        {
            "event_type": out["event_type"],
            "n": out["n"].astype("int64"),
            "avg_k": (out["sum_k"] / out["n"]).round(4),
            "max_k": out["max_k"].astype("int64"),
        }
    )
    return df.sort_values("event_type").reset_index(drop=True)


_PROPS_SQL = """
SELECT event_type, COUNT(*) AS n,
       ROUND(SUM(CAST(props->>'k' AS BIGINT)) * 1.0 / COUNT(*), 4) AS avg_k,
       MAX(CAST(props->>'k' AS BIGINT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def asof_last_click(sf_dir: str) -> pd.DataFrame:
    """As-of join: for each 'error' event, the most recent prior 'click'
    value of the same user (backward merge_asof per user-hash bucket).
    Oracle: DuckDB ASOF JOIN.
    """
    from ..stages.asof import asof_join

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type", "value"])
    errors = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "error")).drop_columns(["event_type"]),
        batch_format="pyarrow",
    )
    clicks = ev.map_batches(
        lambda t: pa.table(
            {
                "user_id": t.filter(pc.equal(t["event_type"], "click"))["user_id"],
                "ts": t.filter(pc.equal(t["event_type"], "click"))["ts"],
                "click_value": t.filter(pc.equal(t["event_type"], "click"))["value"],
            }
        ),
        batch_format="pyarrow",
    )
    joined = asof_join(errors, clicks, key="user_id", ts="ts", num_buckets=8)
    df = joined.to_pandas()
    df = df[df["click_value"].notna()]
    out = pd.DataFrame(
        {
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "click_value": df["click_value"].round(2),
        }
    )
    return out.sort_values("event_id").reset_index(drop=True)


_ASOF_SQL = """
SELECT e.event_id, e.user_id, ROUND(c.value, 2) AS click_value
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts >= c.ts
ORDER BY e.event_id
"""


def events_rolling_sum(sf_dir: str) -> pd.DataFrame:
    """Running per-user cumulative sum over the ts-ordered event log:
    ONE hash-bucket shuffle, then fully-vectorized per-bucket cumsum
    (sort by (user, ts, id), pandas grouped cumsum — no per-user python
    calls; same bucketing discipline as session_counts).  Oracle: SQL
    window function."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    num_buckets = 16

    def tag(batch: pa.Table) -> pa.Table:
        v = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.append_column("__b", pa.array((v % num_buckets).astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        running = g.groupby("user_id", sort=False)["value"].cumsum().round(2)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64"),
                "user_id": g["user_id"].astype("int64"),
                "running_value": running,
            }
        )

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


_ROLLING_SQL = """
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING), 2) AS running_value
FROM events ORDER BY event_id
"""


def hash_sampled_events(sf_dir: str) -> pd.DataFrame:
    """Deterministic ~6% hash sample (md5 of the key; reproducible on
    any engine — unlike seeded RNG sampling, the SQL oracle reproduces
    it exactly)."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id"])

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_pylist()
        keep = [H.md5_hex(str(i))[:2] < "10" for i in ids]
        return batch.filter(pa.array(keep))

    out = ds.map_batches(sample, batch_format="pyarrow").to_pandas()
    out = out.astype({"event_id": "int64", "user_id": "int64"})
    return out.sort_values("event_id").reset_index(drop=True)


_HASH_SAMPLE_SQL = """
SELECT event_id, user_id FROM events
WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < '10'
ORDER BY event_id
"""


def users_in_both_types(sf_dir: str) -> pd.DataFrame:
    """Set intersection (§2.7 — absent from the reference): users with
    both 'click' and 'error' events, as ONE grouped flag aggregation —
    per-batch (user, has_click, has_error) partials pre-aggregated with
    Arrow group_by, a single groupby(user) Max-merge, filter both flags.
    No distinct-set ever lands on the driver (r1 review finding #3)."""
    from ray.data.aggregate import Max

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def flags(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "is_click": pc.cast(pc.equal(batch["event_type"], "click"), pa.int8()),
                "is_error": pc.cast(pc.equal(batch["event_type"], "error"), pa.int8()),
            }
        )
        return (
            t.group_by(["user_id"])
            .aggregate([("is_click", "max"), ("is_error", "max")])
            .rename_columns(["user_id", "is_click", "is_error"])
        )

    agg = (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("is_click", alias_name="c"), Max("is_error", alias_name="e"))
        .to_pandas()
    )
    out = agg[(agg["c"] == 1) & (agg["e"] == 1)][["user_id"]]
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


_INTERSECT_SQL = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
ORDER BY user_id
"""


def llm_extract_stub(sf_dir: str) -> pd.DataFrame:
    """LLM structured extraction (M7) with the deterministic stub model:
    schema {summary: first-5-words, n_words: count} — oracle-exact
    because the fake inference is pure arithmetic over the text."""
    import json as _json

    from ..stages.llm import LLMExtractStage

    schema = {"properties": {"summary": {"type": "string"}, "n_words": {"type": "integer"}}}
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(
        LLMExtractStage,
        fn_constructor_args=(schema, "summarize", "text", "doc_id"),
        batch_format="pyarrow",
        concurrency=(1, 4),
    ).to_pandas()
    rec = out["extracted_content"].map(_json.loads)
    df = pd.DataFrame(
        {
            "doc_id": out["doc_id"].astype("int64"),
            "summary": rec.map(lambda r: r["summary"]),
            "n_words": rec.map(lambda r: r["n_words"]).astype("int64"),
        }
    )
    return df.sort_values("doc_id").reset_index(drop=True)


_LLM_STUB_SQL = """
SELECT doc_id,
       array_to_string((string_split(trim(text), ' '))[1:5], ' ') AS summary,
       CAST(len(string_split(trim(text), ' ')) AS BIGINT)         AS n_words
FROM documents ORDER BY doc_id
"""


_TINY_CORPUS = "/tmp/dc4r_corpus/tiny"  # deterministic path of ensure("tiny")


def _link_edges(batch: "pa.Table") -> "pa.Table":
    """Shared (src, dst) link-edge extraction batch adapter for the
    graph queries (pagerank / degree / triangles / clustering) — ONE
    definition so the graph family can never diverge on link semantics."""
    from ..functions.extract import extract_links

    srcs: list = []
    dsts: list = []
    for u, h in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
        for link in extract_links(h, u):
            srcs.append(u)
            dsts.append(link)
    return pa.table(
        {"src": pa.array(srcs, pa.string()), "dst": pa.array(dsts, pa.string())}
    )


def _ensure_text_index(sf_dir: str, prefix: str = "", build=None) -> str:
    """Build-once cache of the persisted documents text index, keyed by
    (prefix, sf_dir, parquet mtime+size) — bm25_indexed_top10,
    bm25_appended_top10 (with a prefix) and phrase_search_docs must
    share ONE copy of this protocol or the cache silently splits."""
    import hashlib
    import os as _os
    import shutil

    from ..stages.textindex import build_text_index

    doc_path = _p(sf_dir, "documents")
    st = _os.stat(doc_path)
    key = f"{prefix}{sf_dir}|{st.st_mtime_ns}|{st.st_size}"
    idx_dir = f"/tmp/dc4r_text_index/{hashlib.md5(key.encode()).hexdigest()[:12]}"
    done = f"{idx_dir}/_DONE"
    if not _os.path.exists(done):
        shutil.rmtree(idx_dir, ignore_errors=True)
        ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
        if build is None:
            build_text_index(ds, "doc_id", "text", idx_dir, num_buckets=32)
        else:
            build(ds, idx_dir)
        open(done, "w").close()
    return idx_dir


# element counts per tag: the engine's stack-based tag scanner counts
# every OPENING tag (selectors._TAG_RE, closing tags skipped), capped at
# 500 elements per document in document order — expressed in SQL as a
# regex tag extraction with a list slice (r2: rows-only)
_SELECTOR_SQL = rf"""
WITH p AS (SELECT decode(html) AS h FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet')),
tags AS (SELECT unnest((regexp_extract_all(h, '<([a-zA-Z][a-zA-Z0-9-]*)((?:\s+[^<>]*?)?)/?>', 1))[1:500]) AS tag FROM p)
SELECT lower(tag) AS tag, COUNT(*) AS n FROM tags GROUP BY 1 ORDER BY 1
"""


def selector_tag_counts(sf_dir: str) -> pd.DataFrame:
    """Selector auto-detection (M8) over the tiny corpus html: count of
    detected elements per tag — oracle-checked against a SQL regex tag
    extraction mirroring the scanner's opening-tag/500-cap spec."""
    from ..functions.selectors import auto_detect_selectors
    from ..sources.corpus import ensure

    corpus = ensure("tiny")
    ds = rd.read_parquet(f"{corpus}/pages", columns=["html"])

    def count_tags(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for h in batch["html"].to_pylist():
            for sel in auto_detect_selectors(h):
                c[sel["tag"]] += 1
        return pa.table(
            {"tag": pa.array(list(c.keys()), pa.string()), "n": pa.array(list(c.values()), pa.int64())}
        )

    parts = ds.map_batches(count_tags, batch_format="pyarrow").to_pandas()
    out = parts.groupby("tag", as_index=False)["n"].sum()
    return out.sort_values("tag").reset_index(drop=True)


_PAGE_META_SQL = rf"""
WITH p AS (SELECT url, decode(html) AS h FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet'))
SELECT url,
       regexp_extract(h, '(?s)<title[^>]*>(.*?)</title>', 1)       AS title,
       regexp_extract(h, '(?s)<h1[^>]*>(.*?)</h1>', 1)             AS h1,
       CAST(len(regexp_extract_all(h, '<h[1-6][\s>]')) AS BIGINT)  AS n_headings,
       CAST(len(regexp_extract_all(h, '<a[\s>]')) AS BIGINT)       AS n_links,
       CAST(len(regexp_extract_all(h, '<p[\s>]')) AS BIGINT)       AS n_paragraphs,
       CAST(len(regexp_extract_all(h, '<img[\s>]')) AS BIGINT)     AS n_images
FROM p ORDER BY url
"""


def page_metadata(sf_dir: str) -> pd.DataFrame:
    """Per-page metadata extraction (the reference's CrawlResult.metadata
    / media counts, triggers.py:220-226) over the tiny corpus: title,
    first h1, heading/link/paragraph/image counts — RE2 kernels on both
    sides, so the oracle is bit-exact."""
    from ..functions.extract import page_metadata_columns
    from ..sources.corpus import ensure

    corpus = ensure("tiny")
    ds = rd.read_parquet(f"{corpus}/pages", columns=["url", "html"])

    def meta(batch: pa.Table) -> pa.Table:
        return pa.table({"url": batch["url"], **page_metadata_columns(batch["html"])})

    df = ds.map_batches(meta, batch_format="pyarrow").to_pandas()
    return df.sort_values("url").reset_index(drop=True)


# =========================================================================
# H. Crawl pipelines (north star; rows-only — conformance is pytest's)
# =========================================================================

def crawl_full_tiny(
    out_dir: str = "/tmp/dc4r_entry_crawl", max_rounds: int = 6
) -> pd.DataFrame:
    """Full crawl on the deterministic tiny corpus with the complete
    engine-ordered output (fetch_seq, round, priority are engine-defined
    — pinned by the byte-frozen pytest fixtures, not SQL-derivable).
    This is the driver ``entry()`` smoke."""
    import shutil

    from ..frontier.crawler import Crawler, CrawlConfig, read_crawl_output
    from ..sources.corpus import ensure

    corpus = ensure("tiny")
    shutil.rmtree(out_dir, ignore_errors=True)
    c = Crawler(
        corpus,
        out_dir,
        CrawlConfig(
            num_shards=2,
            fetch_concurrency=2,
            max_rounds=max_rounds,
            per_shard_budget=500,
            checkpoint=False,
        ),
    )
    c.run()
    c.kill_shards()
    out = read_crawl_output(out_dir)
    return out.select(
        ["fetch_seq", "round", "url", "host", "priority", "status", "n_links"]
    ).to_pandas()


def crawl_tiny_e2e(sf_dir: str) -> pd.DataFrame:
    """Full crawl on the deterministic tiny corpus: frontier (cuckoo
    seen-set, politeness, robots) → fetch actors → extract → sink — run
    to frontier EXHAUSTION so the published output is the link-graph
    closure, then value-hash-checked per url against the recursive-CTE
    oracle (status + host + extracted link count).  Engine-defined
    ordering columns (fetch_seq, round, priority) stay pinned by the
    byte-frozen pytest fixtures; sf_dir is unused (corpus is
    self-generated).  r5: upgraded from rows-only to oracle-green."""
    df = crawl_full_tiny(out_dir="/tmp/dc4r_query_crawl", max_rounds=50)
    return (
        df[["url", "host", "status", "n_links"]]
        .sort_values("url")
        .reset_index(drop=True)
    )


_CRAWL_E2E_SQL = rf"""
WITH pages AS (
  SELECT url, decode(html) AS html,
         regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
         coalesce(regexp_extract(url, '^[a-z]+://[^/]+(/.*)$', 1), '') AS path
  FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet')
),
rob AS (SELECT host, unnest(disallow) AS d FROM read_parquet('{_TINY_CORPUS}/robots.parquet')),
denied_pages AS (
  SELECT DISTINCT p.url FROM pages p JOIN rob r ON r.host = p.host WHERE starts_with(p.path, r.d)
),
links AS (
  SELECT p.url AS src,
         CASE WHEN href LIKE 'http%' THEN href
              WHEN href = '/' THEN 'https://' || p.host
              ELSE 'https://' || p.host || href END AS dst
  FROM pages p, UNNEST(regexp_extract_all(p.html, '<a\s[^>]*?href\s*=\s*["'']([^"''<>]+)["'']', 1)) AS u(href)
  WHERE p.url NOT IN (SELECT url FROM denied_pages)
),
reach AS (
  WITH RECURSIVE r(url) AS (
     SELECT url FROM read_parquet('{_TINY_CORPUS}/seeds.parquet')
     UNION
     SELECT l.dst FROM r JOIN links l ON l.src = r.url
  ) SELECT url FROM r
),
-- engine n_links = len(extract_links(...)): resolved+normalized links,
-- FIRST-OCCURRENCE DEDUPED per page → COUNT(DISTINCT dst) per src
plink_counts AS (
  SELECT src AS url, CAST(COUNT(DISTINCT dst) AS BIGINT) AS n_links
  FROM links GROUP BY src
)
SELECT r.url,
       regexp_extract(r.url, '^[a-z]+://([^/]+)', 1) AS host,
       CASE WHEN dn.url IS NOT NULL THEN 'robots_denied'
            WHEN p.url IS NOT NULL THEN 'ok' ELSE 'miss' END AS status,
       CASE WHEN dn.url IS NULL AND p.url IS NOT NULL
            THEN COALESCE(lc.n_links, 0) ELSE 0 END AS n_links
FROM reach r
LEFT JOIN pages p ON p.url = r.url
LEFT JOIN denied_pages dn ON dn.url = r.url
LEFT JOIN plink_counts lc ON lc.url = r.url
ORDER BY r.url
"""


def extract_corpus_text(sf_dir: str) -> pd.DataFrame:
    """The minimum end-to-end slice (SURVEY.md §7 step 2): read pages →
    map_batches(extract) → compare-ready (url, md5(text)).  Hash-checked
    against the corpus oracle text column (r2: rows-only); byte-identity
    is also asserted in pytest."""
    from ..sources.corpus import ensure

    corpus = ensure("tiny")
    ds = rd.read_parquet(f"{corpus}/pages", columns=["url", "html"])

    def ex(batch: pa.Table) -> pa.Table:
        from ..functions.extract import extract_text

        texts = [extract_text(h) for h in batch["html"].to_pylist()]
        return pa.table(
            {
                "url": batch["url"],
                "text_md5": pa.array(H.md5_hex_many(texts), pa.string()),
            }
        )

    out = ds.map_batches(ex, batch_format="pyarrow").to_pandas()
    return out.sort_values("url").reset_index(drop=True)


# byte-identity invariant as an oracle: the corpus `text` column was
# computed by the SAME pure extractor at generation time (FIXTURES.md
# §1), so engine re-extraction must md5-match it per url (r2: rows-only)
_EXTRACT_CORPUS_SQL = f"""
SELECT url, md5(text) AS text_md5
FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet') ORDER BY url
"""


def crawl_extract_e2e(sf_dir: str) -> pd.DataFrame:
    """FUSED crawl→extract (CrawlConfig.enrich_spec): the crawl round
    pipeline applies the enrich_fingerprints registry step before each
    round's atomic publish, so pages land already tokenized/fingerprinted
    — one fewer full corpus read than crawl-then-extract (byte-equality
    of the two paths is pinned by TestFusedEnrich).  Run to frontier
    exhaustion; the oracle recomputes (url, text_md5, n_tokens) for the
    closure's fetched pages from the corpus text (byte-identical
    extraction by construction — FIXTURES.md §1)."""
    import shutil

    from ..frontier.crawler import Crawler, CrawlConfig, read_crawl_output
    from ..functions import hashing as H
    from ..sources.corpus import ensure

    corpus = ensure("tiny")
    out_dir = "/tmp/dc4r_query_crawl_fused"
    shutil.rmtree(out_dir, ignore_errors=True)
    c = Crawler(
        corpus,
        out_dir,
        CrawlConfig(
            num_shards=2,
            fetch_concurrency=2,
            max_rounds=50,
            per_shard_budget=500,
            checkpoint=False,
            enrich_spec=[{"step": "enrich_fingerprints"}],
        ),
    )
    c.run()
    c.kill_shards()
    out = read_crawl_output(out_dir)
    df = out.select(["url", "status", "text", "n_tokens"]).to_pandas()
    df = df[df.status == "ok"].copy()
    df["text_md5"] = H.md5_hex_many(df["text"].tolist())
    return (
        df[["url", "text_md5", "n_tokens"]]
        .sort_values("url")
        .reset_index(drop=True)
    )


_CRAWL_EXTRACT_SQL = rf"""
WITH pages AS (
  SELECT url, decode(html) AS html, text,
         regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
         coalesce(regexp_extract(url, '^[a-z]+://[^/]+(/.*)$', 1), '') AS path
  FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet')
),
rob AS (SELECT host, unnest(disallow) AS d FROM read_parquet('{_TINY_CORPUS}/robots.parquet')),
denied_pages AS (
  SELECT DISTINCT p.url FROM pages p JOIN rob r ON r.host = p.host WHERE starts_with(p.path, r.d)
),
links AS (
  SELECT p.url AS src,
         CASE WHEN href LIKE 'http%' THEN href
              WHEN href = '/' THEN 'https://' || p.host
              ELSE 'https://' || p.host || href END AS dst
  FROM pages p, UNNEST(regexp_extract_all(p.html, '<a\s[^>]*?href\s*=\s*["'']([^"''<>]+)["'']', 1)) AS u(href)
  WHERE p.url NOT IN (SELECT url FROM denied_pages)
),
reach AS (
  WITH RECURSIVE r(url) AS (
     SELECT url FROM read_parquet('{_TINY_CORPUS}/seeds.parquet')
     UNION
     SELECT l.dst FROM r JOIN links l ON l.src = r.url
  ) SELECT url FROM r
)
SELECT p.url, md5(p.text) AS text_md5,
       CAST(length(p.text) - length(replace(p.text, ' ', '')) + 1 AS BIGINT) AS n_tokens
FROM reach r
JOIN pages p ON p.url = r.url
WHERE r.url NOT IN (SELECT url FROM denied_pages)
ORDER BY p.url
"""


def crawl_reachability(sf_dir: str) -> pd.DataFrame:
    """The crawl's SEEN SET oracle-checked end to end: run the frontier
    loop to exhaustion (politeness-free, unbounded budget) and return
    every selected url with its fetch status.  The DuckDB oracle
    recomputes the same set as the recursive-CTE transitive closure of
    the corpus link graph from the seed list — robots-denied pages
    contribute no edges, misses are dangling links — and derives each
    url's status from pages/robots alone.  This pins the frontier's
    dedup + discovery semantics (north rule: 'matching the reference's
    crawl ordering and URL-seen set') with a full value-hash check;
    crawl ORDER stays pinned by the byte-frozen pytest fixtures
    (fetch_seq is engine-defined and not SQL-derivable)."""
    import shutil

    from ..frontier.crawler import Crawler, CrawlConfig, read_crawl_output
    from ..sources.corpus import ensure

    corpus = ensure("tiny")
    out_dir = "/tmp/dc4r_query_reach"
    shutil.rmtree(out_dir, ignore_errors=True)
    c = Crawler(
        corpus,
        out_dir,
        CrawlConfig(
            num_shards=2,
            fetch_concurrency=2,
            max_rounds=50,
            per_shard_budget=100_000,
            round_ms=10_000_000,
            checkpoint=False,
        ),
    )
    c.run()
    c.kill_shards()
    out = read_crawl_output(out_dir)
    df = out.select(["url", "status"]).to_pandas()
    return df.sort_values("url").reset_index(drop=True)


_REACH_SQL = rf"""
WITH pages AS (
  SELECT url, decode(html) AS html,
         regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
         coalesce(regexp_extract(url, '^[a-z]+://[^/]+(/.*)$', 1), '') AS path
  FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet')
),
rob AS (SELECT host, unnest(disallow) AS d FROM read_parquet('{_TINY_CORPUS}/robots.parquet')),
denied_pages AS (
  SELECT DISTINCT p.url FROM pages p JOIN rob r ON r.host = p.host WHERE starts_with(p.path, r.d)
),
links AS (
  SELECT p.url AS src,
         CASE WHEN href LIKE 'http%' THEN href
              WHEN href = '/' THEN 'https://' || p.host
              ELSE 'https://' || p.host || href END AS dst
  FROM pages p, UNNEST(regexp_extract_all(p.html, '<a\s[^>]*?href\s*=\s*["'']([^"''<>]+)["'']', 1)) AS u(href)
  WHERE p.url NOT IN (SELECT url FROM denied_pages)
),
reach AS (
  WITH RECURSIVE r(url) AS (
     SELECT url FROM read_parquet('{_TINY_CORPUS}/seeds.parquet')
     UNION
     SELECT l.dst FROM r JOIN links l ON l.src = r.url
  ) SELECT url FROM r
)
SELECT r.url,
  CASE WHEN EXISTS (SELECT 1 FROM rob
                    WHERE rob.host = regexp_extract(r.url, '^[a-z]+://([^/]+)', 1)
                      AND starts_with(coalesce(regexp_extract(r.url, '^[a-z]+://[^/]+(/.*)$', 1), ''), rob.d))
       THEN 'robots_denied'
       WHEN r.url IN (SELECT url FROM pages) THEN 'ok'
       ELSE 'miss' END AS status
FROM reach r ORDER BY url
"""


def pagerank_corpus(sf_dir: str) -> pd.DataFrame:
    """PageRank over the tiny-corpus link graph (stages/pagerank): the
    ranking step a crawled link corpus feeds.  Engine link extraction is
    the crawler's own (functions/extract.extract_links — the parity with
    the SQL regex-CTE link graph is the one crawl_reachability already
    hash-pins); the oracle reproduces the 3 power iterations as unrolled
    CTEs, including dangling-mass redistribution."""
    from ..functions.extract import extract_links
    from ..sources.corpus import ensure
    from ..stages.pagerank import pagerank

    corpus = ensure("tiny")
    pages = rd.read_parquet(f"{corpus}/pages", columns=["url", "html"])

    pr = pagerank(pages.map_batches(_link_edges, batch_format="pyarrow"), iters=3)
    df = pr.to_pandas().rename(columns={"node": "url"})
    df["pr"] = df["pr"].round(6)
    return df.sort_values("url").reset_index(drop=True)


def hostrank_corpus(sf_dir: str) -> pd.DataFrame:
    """Host-graph PageRank: contract the page link graph to the host
    level (the domain-authority signal crawl schedulers and quality
    filters weight by — Common Crawl publishes exactly this ranking)
    and run the same stages/pagerank power iteration.  The contraction
    is map-side (host extraction inside the edge pass); pagerank dedups
    the edge multiset itself, so host self-loops (intra-host links)
    survive as single edges, identically to the SQL DISTINCT twin."""
    from ..functions.extract import extract_links
    from ..functions.urlnorm import host_of
    from ..sources.corpus import ensure
    from ..stages.pagerank import pagerank

    corpus = ensure("tiny")
    pages = rd.read_parquet(f"{corpus}/pages", columns=["url", "html"])

    def host_edges(batch: pa.Table) -> pa.Table:
        srcs: list = []
        dsts: list = []
        for u, h in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            hu = host_of(u)
            for link in extract_links(h, u):
                srcs.append(hu)
                dsts.append(host_of(link))
        return pa.table(
            {"src": pa.array(srcs, pa.string()), "dst": pa.array(dsts, pa.string())}
        )

    pr = pagerank(pages.map_batches(host_edges, batch_format="pyarrow"), iters=3)
    df = pr.to_pandas().rename(columns={"node": "host"})
    df["pr"] = df["pr"].round(6)
    return df.sort_values("host").reset_index(drop=True)


def _pagerank_sql(iters: int = 3) -> str:
    """Unrolled-CTE PageRank oracle: r0 = uniform, each r{k} one power
    iteration with teleport 0.15/N and dangling mass (1 − Σ pr over
    nodes with out-links) spread uniformly."""
    parts = [
        rf"""
WITH pages AS (
  SELECT url, decode(html) AS html,
         regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host
  FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet')
), links AS (
  SELECT DISTINCT p.url AS src,
         CASE WHEN href LIKE 'http%' THEN href
              WHEN href = '/' THEN 'https://' || p.host
              ELSE 'https://' || p.host || href END AS dst
  FROM pages p, UNNEST(regexp_extract_all(p.html,
       '<a\s[^>]*?href\s*=\s*["'']([^"''<>]+)["'']', 1)) AS u(href)
), nodes AS (
  SELECT src AS node FROM links UNION SELECT dst FROM links
), nn AS (SELECT COUNT(*) * 1.0 AS n FROM nodes),
outdeg AS (SELECT src, COUNT(*) * 1.0 AS deg FROM links GROUP BY src),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes)"""
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f""",
r{k} AS (
  SELECT nd.node,
         0.15 / (SELECT n FROM nn)
         + 0.85 * (COALESCE(s.in_pr, 0)
            + (1 - (SELECT SUM(r.pr) FROM r{p} r JOIN outdeg o ON o.src = r.node))
              / (SELECT n FROM nn)) AS pr
  FROM nodes nd LEFT JOIN (
    SELECT l.dst AS node, SUM(r.pr / o.deg) AS in_pr
    FROM links l JOIN r{p} r ON r.node = l.src JOIN outdeg o ON o.src = l.src
    GROUP BY l.dst) s ON s.node = nd.node
)"""
        )
    parts.append(f"\nSELECT node AS url, ROUND(pr, 6) AS pr FROM r{iters} ORDER BY url")
    return "".join(parts)


def host_components(sf_dir: str) -> pd.DataFrame:
    """Weakly-connected components of the host graph — the seed-list /
    crawl-partitioning primitive (each component can be crawled and
    deduped independently; stages/dedup.connected_components is the
    same two-level Kiveris CC the dup-cluster family uses, so the graph
    op is exercised on a second, non-dedup domain).  Hosts become int63
    node ids via functions/hashing.md5_int63 (≡ DuckDB md5_number_lower
    masked to 63 bits), so the min-label component the engine computes
    is the min-HASH host — which the oracle reproduces exactly, then
    both sides map the label back to its host string.  Scale shape:
    edges and the (hash, host) vocabulary are slim map-side tables;
    labels stay a Dataset; the two label→host joins are bucketed
    hash joins, no driver materialization."""
    from ..functions.extract import extract_links
    from ..functions.hashing import md5_int63
    from ..functions.urlnorm import host_of
    from ..sources.corpus import ensure
    from ..stages.dedup import connected_components
    from ..stages.join import lookup_join

    corpus = ensure("tiny")
    pages = rd.read_parquet(f"{corpus}/pages", columns=["url", "html"])

    def host_edges(batch: pa.Table) -> pa.Table:
        srcs: list = []
        dsts: list = []
        for u, h in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            hu = host_of(u)
            for link in extract_links(h, u):
                srcs.append(hu)
                dsts.append(host_of(link))
        return pa.table(
            {
                "id_a": pa.array(md5_int63(srcs), pa.int64()),
                "id_b": pa.array(md5_int63(dsts), pa.int64()),
                "host_a": pa.array(srcs, pa.string()),
                "host_b": pa.array(dsts, pa.string()),
            }
        )

    edges = pages.map_batches(host_edges, batch_format="pyarrow")

    # (hash, host) vocabulary: per-batch dedup, then one tiny groupby
    def vocab(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                "h": pa.concat_arrays(
                    [t["id_a"].combine_chunks(), t["id_b"].combine_chunks()]
                ),
                "host": pa.concat_arrays(
                    [t["host_a"].combine_chunks(), t["host_b"].combine_chunks()]
                ),
            }
        )
        agg = tt.group_by("h").aggregate([("host", "min")])
        return pa.table({"h": agg["h"], "host": agg["host_min"]})

    def first_row(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    # materialized: consumed by BOTH label joins below
    mapping = (
        edges.map_batches(vocab, batch_format="pyarrow")
        .groupby("h")
        .map_groups(first_row)
        .materialize()
    )

    cc = connected_components(edges)  # (node, component) int63 labels
    # unique-keyed host vocabulary → guarded broadcast lookup (zero
    # shuffle when it fits; bucketed hash_join past the 3M-row budget)
    labeled = lookup_join(cc, mapping, on="node", right_on="h")
    roots = mapping.map_batches(
        lambda t: pa.table({"component": t["h"], "root_host": t["host"]}),
        batch_format="pyarrow",
    )
    out = lookup_join(labeled, roots, on="component").to_pandas()
    return (
        out[["host", "root_host"]].sort_values("host").reset_index(drop=True)
    )


_HOST_COMPONENTS_SQL = rf"""
WITH RECURSIVE pages AS (
  SELECT url, decode(html) AS html,
         regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host
  FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet')
), rawlinks AS (
  SELECT p.host AS src,
         CASE WHEN href LIKE 'http%' THEN regexp_extract(href, '^[a-z]+://([^/]+)', 1)
              ELSE p.host END AS dst
  FROM pages p, UNNEST(regexp_extract_all(p.html,
       '<a\s[^>]*?href\s*=\s*["'']([^"''<>]+)["'']', 1)) AS u(href)
), links AS (
  SELECT DISTINCT src, dst FROM rawlinks
), nodes AS (
  -- explicit DISTINCT: under WITH RECURSIVE, DuckDB runs plain UNION
  -- between these branches as UNION ALL
  SELECT DISTINCT host FROM (
    SELECT src AS host FROM links UNION ALL SELECT dst FROM links)
), hid AS (
  SELECT host, CAST(md5_number_lower(host) & 9223372036854775807 AS BIGINT) AS h
  FROM nodes
), sym AS (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM links WHERE src <> dst
    UNION ALL SELECT dst, src FROM links WHERE src <> dst)
), reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a
), comp AS (
  SELECT n.host, LEAST(hn.h, COALESCE(MIN(hb.h), hn.h)) AS ch
  FROM nodes n
  JOIN hid hn ON hn.host = n.host
  LEFT JOIN reach r ON r.a = n.host
  LEFT JOIN hid hb ON hb.host = r.b
  GROUP BY n.host, hn.h
)
SELECT c.host, hr.host AS root_host
FROM comp c JOIN hid hr ON hr.h = c.ch
ORDER BY c.host
"""


def warc_export_hosts(sf_dir: str) -> pd.DataFrame:
    """WARC archival round-trip (sources/warc.warc_export +
    write_warc_file): the tiny corpus is exported as one
    host-partitioned .warc.gz per host (response records with real
    HTTP payload blocks, deterministic record order, atomic publish),
    then read BACK with the engine's own from-scratch WARC parser —
    per-host record counts and an order-pinned md5 over the recovered
    URLs must match the source-of-truth parquet the oracle reads.
    Exercises writer ⇄ reader symmetry end-to-end, not just the reader."""
    import glob as _glob
    import hashlib as _hl
    import os as _os
    import shutil

    from ..sources.corpus import ensure
    from ..sources.warc import read_wet, warc_export

    corpus = ensure("tiny")
    sig = _hl.md5(
        "|".join(
            f"{f}:{_os.stat(f).st_mtime_ns}"
            for f in sorted(_glob.glob(f"{corpus}/pages/*.parquet"))
        ).encode()
    ).hexdigest()[:12]
    out_dir = f"/tmp/dc4r_warc_export/{sig}"
    done = f"{out_dir}/_DONE"

    def add_host(t: pa.Table) -> pa.Table:
        host = pc.replace_substring_regex(
            pc.replace_substring_regex(t["url"], pattern="^[a-z]+://", replacement=""),
            pattern="/.*$",
            replacement="",
        )
        return t.append_column("host", host)

    if not _os.path.exists(done):
        shutil.rmtree(out_dir, ignore_errors=True)
        pages = rd.read_parquet(f"{corpus}/pages", columns=["url", "html"])
        warc_export(
            pages.map_batches(add_host, batch_format="pyarrow"), out_dir
        ).materialize()  # consume the manifest: files are the side effect
        open(done, "w").close()

    files = sorted(_glob.glob(f"{out_dir}/*.warc.gz"))
    back = read_wet(files, conversion_only=False)

    def resp_urls(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.equal(t["record_type"], "response"))
        host = pc.replace_substring_regex(
            pc.replace_substring_regex(sub["url"], pattern="^[a-z]+://", replacement=""),
            pattern="/.*$",
            replacement="",
        )
        return pa.table({"host": host, "url": sub["url"]})

    def per_host(g: pd.DataFrame) -> pd.DataFrame:
        urls = sorted(g["url"].tolist())
        return pd.DataFrame(
            {
                "host": [g["host"].iloc[0]],
                "n_records": [np.int64(len(urls))],
                "urls_md5": [_hl.md5("|".join(urls).encode("utf-8")).hexdigest()],
            }
        )

    out = (
        back.map_batches(resp_urls, batch_format="pyarrow")
        .groupby("host")
        .map_groups(per_host, batch_format="pandas")
        .to_pandas()
    )
    out["n_records"] = out["n_records"].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


_WARC_EXPORT_SQL = rf"""
SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       md5(string_agg(url, '|' ORDER BY url)) AS urls_md5
FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet')
GROUP BY host ORDER BY host
"""


def canonical_url_groups(sf_dir: str) -> pd.DataFrame:
    """URL-variant dedup (stages/dedup.canonical_url_dedup): http/https,
    www/apex, query-string and trailing-slash spellings of one logical
    page collapse under the RE2 canonical key and the preferred spelling
    wins (https-first, shortest, lexicographic) — the frontier-hygiene
    step upstream of fetch.  Variants are planted SQL-reproducibly from
    the tiny-corpus page URLs (md5-keyed: %2 adds an http+utm spelling,
    %3 adds a www+trailing-slash spelling)."""
    from ..functions.hashing import md5_int63
    from ..sources.corpus import ensure
    from ..stages.dedup import canonical_url_dedup

    corpus = ensure("tiny")
    pages = rd.read_parquet(f"{corpus}/pages", columns=["url"])

    def variants(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        hs = md5_int63(urls)
        out: list = []
        for u, h in zip(urls, hs):
            out.append(u)
            if h % 2 == 0:
                out.append(u.replace("https://", "http://") + "?utm_source=feed")
            if h % 3 == 0:
                out.append(u.replace("https://", "https://www.") + "/")
        return pa.table({"url": pa.array(out, pa.string())})

    ds = pages.map_batches(variants, batch_format="pyarrow")
    out = canonical_url_dedup(ds).to_pandas()
    out["n_variants"] = out["n_variants"].astype("int64")
    return out.sort_values("canon_key").reset_index(drop=True)


_CANONICAL_URL_SQL = rf"""
WITH pages AS (SELECT url FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet')),
h AS (SELECT url, (md5_number_lower(url) & 9223372036854775807) AS hv FROM pages),
vars AS (
  SELECT url FROM h
  UNION ALL
  SELECT replace(url, 'https://', 'http://') || '?utm_source=feed' FROM h WHERE hv % 2 = 0
  UNION ALL
  SELECT replace(url, 'https://', 'https://www.') || '/' FROM h WHERE hv % 3 = 0
),
k AS (
  SELECT url,
         lower(regexp_replace(regexp_replace(regexp_replace(regexp_replace(url,
             '^https?://', ''), '^www\.', ''), '\?.*$', ''), '/+$', '')) AS canon_key,
         CASE WHEN url LIKE 'https://%' THEN 0 ELSE 1 END AS pref,
         length(url) AS len
  FROM vars
)
SELECT canon_key, url AS best_url, CAST(n_variants AS BIGINT) AS n_variants FROM (
  SELECT canon_key, url,
         ROW_NUMBER() OVER (PARTITION BY canon_key ORDER BY pref, len, url) AS rn,
         COUNT(DISTINCT url) OVER (PARTITION BY canon_key) AS n_variants
  FROM k
) WHERE rn = 1 ORDER BY canon_key
"""


def _hostrank_sql(iters: int = 3) -> str:
    """hostrank_corpus oracle: the _pagerank_sql unrolled power
    iteration over the host-CONTRACTED distinct edge set (self-loops
    kept, like the engine's contraction)."""
    parts = [
        rf"""
WITH pages AS (
  SELECT url, decode(html) AS html,
         regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host
  FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet')
), rawlinks AS (
  SELECT p.host AS src,
         CASE WHEN href LIKE 'http%' THEN regexp_extract(href, '^[a-z]+://([^/]+)', 1)
              ELSE p.host END AS dst
  FROM pages p, UNNEST(regexp_extract_all(p.html,
       '<a\s[^>]*?href\s*=\s*["'']([^"''<>]+)["'']', 1)) AS u(href)
), links AS (
  SELECT DISTINCT src, dst FROM rawlinks
), nodes AS (
  SELECT src AS node FROM links UNION SELECT dst FROM links
), nn AS (SELECT COUNT(*) * 1.0 AS n FROM nodes),
outdeg AS (SELECT src, COUNT(*) * 1.0 AS deg FROM links GROUP BY src),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes)"""
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f""",
r{k} AS (
  SELECT nd.node,
         0.15 / (SELECT n FROM nn)
         + 0.85 * (COALESCE(s.in_pr, 0)
            + (1 - (SELECT SUM(r.pr) FROM r{p} r JOIN outdeg o ON o.src = r.node))
              / (SELECT n FROM nn)) AS pr
  FROM nodes nd LEFT JOIN (
    SELECT l.dst AS node, SUM(r.pr / o.deg) AS in_pr
    FROM links l JOIN r{p} r ON r.node = l.src JOIN outdeg o ON o.src = l.src
    GROUP BY l.dst) s ON s.node = nd.node
)"""
        )
    parts.append(f"\nSELECT node AS host, ROUND(pr, 6) AS pr FROM r{iters} ORDER BY host")
    return "".join(parts)


# =========================================================================
# Corpus-hygiene family: PII redaction, repetition stats, benchmark
# decontamination, stratified sampling, persisted BM25 index
# =========================================================================

# Deterministic PII injection so the redaction path has real work to do on
# the synthetic corpus: docs with doc_id % 3 != 0 get an email + IP + phone
# appended, expressed identically in SQL so the oracle redacts the same
# bytes.  Docs with doc_id % 3 == 0 stay clean (the no-op path is part of
# the check: their red_md5 must equal md5(text)).
def _inject_pii(ids: np.ndarray, texts: list) -> list:
    out = []
    for i, t in zip(ids, texts):
        i = int(i)
        if i % 3 != 0:
            t = (
                f"{t} contact user{i}@example.com or 10.{i % 256}.0.1 "
                f"or call 555-{i % 1000:03d}-{i % 10000:04d}"
            )
        out.append(t)
    return out


def pii_redacted_docs(sf_dir: str) -> pd.DataFrame:
    """PII redaction (functions/pii.redact_table): email/IPv4/phone counts
    + md5 of the redacted text, all via Arrow RE2 kernels
    (count_substring_regex / replace_substring_regex — zero row loops in
    the scrub itself).  DuckDB's regexp_* are the same RE2 engine, so the
    oracle reproduces counts AND redacted bytes exactly."""
    from ..functions.pii import redact_table

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def scrub(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        inj = pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": pa.array(_inject_pii(ids, batch["text"].to_pylist()), pa.string()),
            }
        )
        red = redact_table(inj, "text")
        return pa.table(
            {
                "doc_id": red["doc_id"],
                "n_email": red["n_email"],
                "n_ip": red["n_ip"],
                "n_phone": red["n_phone"],
                "red_md5": pa.array(H.md5_hex_many(red["text"].to_pylist()), pa.string()),
            }
        )

    return (
        ds.map_batches(scrub, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


_PII_SQL = """
WITH inj AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 <> 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com or 10.' || CAST(doc_id % 256 AS VARCHAR)
                   || '.0.1 or call 555-' || printf('%03d', doc_id % 1000)
                   || '-' || printf('%04d', doc_id % 10000)
              ELSE text END AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ip,
       CAST(len(regexp_extract_all(t, '\\b\\d{3}-\\d{3}-\\d{4}\\b')) AS BIGINT) AS n_phone,
       md5(regexp_replace(regexp_replace(regexp_replace(t,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
           '\\b\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g')) AS red_md5
FROM inj ORDER BY doc_id
"""


def repetition_by_lang(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition signals (functions/repetition): per-lang
    mean top-2-gram coverage and duplicate-3-gram fraction.  Engine counts
    hashed n-grams (windowed siphash — no per-gram strings); the oracle
    counts exact string n-grams; equal absent an in-document 64-bit
    collision (~1e-16/doc, the shingle family's accepted risk)."""
    from ..functions.repetition import repetition_stats

    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def metrics(batch: pa.Table) -> pa.Table:
        st = repetition_stats(batch["text"].to_pylist())
        return pa.table(
            {
                "lang": batch["lang"],
                "top2": pa.array(st["top2_frac"], pa.float64()),
                "dup3": pa.array(st["dup3_frac"], pa.float64()),
            }
        )

    out = partial_grouped_sum(
        ds.map_batches(metrics, batch_format="pyarrow"),
        ["lang"],
        sums=["top2", "dup3"],
        count_alias="n_docs",
    ).to_pandas()
    df = pd.DataFrame(
        {
            "lang": out["lang"],
            "n_docs": out["n_docs"].astype("int64"),
            "avg_top2_frac": (out["sum_top2"] / out["n_docs"]).round(4),
            "avg_dup3_frac": (out["sum_dup3"] / out["n_docs"]).round(4),
        }
    )
    return df.sort_values("lang").reset_index(drop=True)


_REPETITION_SQL = """
WITH tok AS (
  SELECT doc_id, lang, regexp_extract_all(lower(text), '\\w+') AS w FROM documents
),
g AS (
  SELECT doc_id, lang, len(w) AS n_tok,
         [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))] AS g2,
         [w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)] AS g3
  FROM tok
),
t2 AS (
  SELECT doc_id, MAX(c) AS maxc FROM (
    SELECT doc_id, gram, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(g2) AS gram FROM g) GROUP BY doc_id, gram
  ) GROUP BY doc_id
),
t3 AS (
  SELECT doc_id, 1.0 - COUNT(DISTINCT gram) * 1.0 / COUNT(*) AS dup3
  FROM (SELECT doc_id, unnest(g3) AS gram FROM g) GROUP BY doc_id
)
SELECT g.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(CASE WHEN g.n_tok >= 2 THEN 2.0 * t2.maxc / g.n_tok ELSE 0.0 END), 4) AS avg_top2_frac,
       ROUND(AVG(COALESCE(t3.dup3, 0.0)), 4) AS avg_dup3_frac
FROM g LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
GROUP BY g.lang ORDER BY g.lang
"""


def contaminated_docs_q(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination (stages/decontam.contaminated_docs):
    docs sharing any exact 13-gram with the bench slice (doc_id % 10 == 0
    — stand-in for a small held-out test set).  Bench n-grams broadcast
    once via ray.put; corpus pass prescreens with vectorized windowed
    hashes, exact string verify on the rare hits."""
    from ..stages.decontam import contaminated_docs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _part(keep_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            mask = (ids % 10 == 0) if keep_bench else (ids % 10 != 0)
            return t.filter(pa.array(mask))

        return f

    corpus = ds.map_batches(_part(False), batch_format="pyarrow")
    bench = ds.map_batches(_part(True), batch_format="pyarrow")
    out = contaminated_docs(corpus, bench, "doc_id", "text", n=13)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


_CONTAM_SQL = """
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS w FROM documents
),
g AS (
  SELECT doc_id,
         list_distinct([array_to_string(w[i:i+12], ' ') FOR i IN range(1, len(w) - 11)]) AS grams
  FROM tok WHERE len(w) >= 13
),
b AS (SELECT list_distinct(flatten(list(grams))) AS bg FROM g WHERE doc_id % 10 = 0)
SELECT g.doc_id, CAST(len(list_intersect(g.grams, b.bg)) AS BIGINT) AS n_hit
FROM g, b
WHERE g.doc_id % 10 <> 0 AND len(list_intersect(g.grams, b.bg)) > 0
ORDER BY g.doc_id
"""


def stratified_events_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic stratified sample (stages/sample.stratified_sample):
    exactly 50 events per event_type, the 50 smallest by
    (md5(event_id), event_id) — per-batch partial prune keeps the shuffle
    at O(n·groups·blocks) rows, never the input."""
    from ..stages.sample import stratified_sample

    ds = _read(sf_dir, "events", columns=["event_type", "event_id", "user_id"])
    out = stratified_sample(
        ds, "event_type", "event_id", 50, keep_cols=["event_type", "event_id", "user_id"]
    )
    return (
        out.to_pandas()
        .sort_values(["event_type", "event_id"])
        .reset_index(drop=True)[["event_type", "event_id", "user_id"]]
    )


_STRATIFIED_SQL = """
SELECT event_type, event_id, user_id FROM (
  SELECT event_type, event_id, user_id,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
  FROM events
) WHERE rn <= 50 ORDER BY event_type, event_id
"""


def bm25_indexed_top10(sf_dir: str) -> pd.DataFrame:
    """BM25 from the PERSISTED inverted index (stages/textindex): build
    once (bucket-partitioned postings keyed by the parquet's mtime+size,
    like the IVF index cache), then answer by reading only the buckets
    the query terms hash to.  Same query/contract as bm25_top10, so the
    same SQL oracle applies — the build/query split must not change one
    row."""
    from ..stages.textindex import bm25_topk_indexed

    idx_dir = _ensure_text_index(sf_dir)
    return bm25_topk_indexed(
        idx_dir, "doc_id", ["customer", "vector", "window"], k=10, num_buckets=32
    )


def bm25_appended_top10(sf_dir: str) -> pd.DataFrame:
    """BM25 from an INCREMENTALLY-built index (stages/textindex.
    append_text_index): the even-doc_id half is indexed first, then the
    odd half is appended as a new segment — the recrawl-delta indexing
    path (snapshot_diff supplies the delta at production scale).  The
    oracle is the same full-corpus BM25 SQL as bm25_top10: segment
    append must not change one row vs indexing everything at once."""
    from ..stages.textindex import append_text_index, bm25_topk_indexed, build_text_index

    def build_then_append(ds, idx_dir):
        def parity(keep_odd: int):
            def fn(t: pa.Table) -> pa.Table:
                return t.filter(
                    pc.equal(pc.bit_wise_and(t["doc_id"], 1), keep_odd)
                )

            return fn

        even = ds.map_batches(parity(0), batch_format="pyarrow")
        odd = ds.map_batches(parity(1), batch_format="pyarrow")
        build_text_index(even, "doc_id", "text", idx_dir, num_buckets=32)
        append_text_index(idx_dir, odd, "doc_id", "text", num_buckets=32)

    idx_dir = _ensure_text_index(sf_dir, prefix="append|", build=build_then_append)
    return bm25_topk_indexed(
        idx_dir, "doc_id", ["customer", "vector", "window"], k=10, num_buckets=32
    )


def encoded_docs(sf_dir: str) -> pd.DataFrame:
    """Vocabulary-mapped token encoding (stages/encode): exact top-256
    corpus vocabulary (count desc, token asc → ids 0..255), every doc's
    token stream mapped in ONE vectorized get_indexer call per batch
    (OOV → -1), per-doc digest = md5 of the comma-joined id sequence —
    the list<int32> payload hash-checked without shipping lists through
    the compare harness."""
    import hashlib

    from ..stages.encode import build_vocab, encode_tokens

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    vocab = build_vocab(ds, "text", 256)
    enc = encode_tokens(ds, "doc_id", "text", vocab)

    def digest(t: pa.Table) -> pa.Table:
        md5s = [
            hashlib.md5(",".join(map(str, x)).encode()).hexdigest()
            for x in t["ids"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_tokens": t["n_tokens"],
                "n_oov": t["n_oov"],
                "ids_md5": pa.array(md5s, pa.string()),
            }
        )

    out = enc.map_batches(digest, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_ENCODED_DOCS_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w FROM documents
),
cnt AS (SELECT unnest(w) AS tok FROM toks),
vocab AS (
  SELECT tok, CAST(row_number() OVER (ORDER BY c DESC, tok) - 1 AS INTEGER) AS id
  FROM (SELECT tok, COUNT(*) AS c FROM cnt GROUP BY tok ORDER BY c DESC, tok LIMIT 256)
),
tok_rows AS (
  SELECT doc_id, unnest(range(1, len(w) + 1)) AS ord, unnest(w) AS tok
  FROM toks WHERE len(w) > 0
),
mapped AS (
  SELECT r.doc_id, r.ord, COALESCE(v.id, -1) AS id
  FROM tok_rows r LEFT JOIN vocab v USING (tok)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN id = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       md5(string_agg(id::VARCHAR, ',' ORDER BY ord)) AS ids_md5
FROM mapped GROUP BY doc_id ORDER BY doc_id
"""


def seq_packing(sf_dir: str) -> pd.DataFrame:
    """Sequence packing (stages/pack): each document's exclusive token
    offset in the doc-id-ordered concatenated token stream, and the
    first/last 512-token training sequence it overlaps.  The global
    prefix sum is a two-phase distributed scan (per-range partials → K-row
    driver prefix → in-range cumsum), so a SQL window SUM() OVER (ORDER BY
    doc_id) reproduces it exactly."""
    from ..stages.pack import pack_sequences

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = pack_sequences(ds, "doc_id", "text", seq_len=512)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


_PACK_SQL = r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '\w+')) AS BIGINT) AS n_tokens
  FROM documents
), s AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
             ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_start
  FROM t WHERE n_tokens > 0
)
SELECT doc_id, n_tokens, tok_start,
       tok_start // 512                    AS seq_first,
       (tok_start + n_tokens - 1) // 512   AS seq_last
FROM s ORDER BY doc_id
"""


def shuffled_export(sf_dir: str) -> pd.DataFrame:
    """Deterministic global training-order shuffle (stages/shuffleorder):
    every document's 0-based position under ORDER BY md5(seed||'-'||id)
    plus its balanced output shard — the reproducible shuffle+shard step
    between corpus cleaning and tokenization.  The global rank is a
    two-phase distributed scan keyed by the hash prefix (256-bucket
    partial counts → O(256) driver prefix → in-bucket sort), so only the
    slim (id, key) table shuffles and a SQL ROW_NUMBER() window
    reproduces it exactly."""
    from ..stages.shuffleorder import shuffle_ranks

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    out = shuffle_ranks(ds, "doc_id", seed="seed0", num_shards=8)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


_SHUFFLE_EXPORT_SQL = """
WITH r AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY md5('seed0-' || CAST(doc_id AS VARCHAR)),
                            doc_id) - 1 AS shuffle_rank
  FROM documents
)
SELECT doc_id, shuffle_rank,
       (shuffle_rank * 8) // (SELECT COUNT(*) FROM documents) AS shard
FROM r ORDER BY doc_id
"""


def quality_model_scores(sf_dir: str) -> pd.DataFrame:
    """Broadcast-model batch inference (stages/modelscore): linear
    quality scorer whose weights are ray.put ONCE and fetched per actor
    in __init__; whole Arrow batches scored with vectorized kernels —
    the fastText/logreg doc-filter pattern with a deterministic kernel
    so the full inference pass is oracle-checkable.  Per-lang rollup of
    kept docs (score > 1.8) via per-batch partial aggregation."""
    import os

    from ..stages.modelscore import DEFAULT_WEIGHTS, quality_model_stage, save_linear_model

    ds = _read(sf_dir, "documents", columns=["lang", "text"])
    # exercise the real model-artifact plumbing: weights round-trip
    # through an on-disk model file (parsed once driver-side, broadcast
    # via ray.put) — output identical to in-memory weights by format.
    model_dir = "/tmp/dc4r_models"
    os.makedirs(model_dir, exist_ok=True)
    model_path = save_linear_model(os.path.join(model_dir, "linear_default.bin"), DEFAULT_WEIGHTS)
    scored = quality_model_stage(ds, text_col="text", concurrency=4, model_path=model_path)

    def partials(batch: pa.Table) -> pa.Table:
        keep = pc.cast(pc.greater(batch["score"], 1.8), pa.int64())
        return pa.table(
            {"lang": batch["lang"], "score": batch["score"], "kept": keep}
        )

    out = partial_grouped_sum(
        scored.map_batches(partials, batch_format="pyarrow"),
        ["lang"],
        sums=["score", "kept"],
        count_alias="n_docs",
    ).to_pandas()
    df = pd.DataFrame(
        {
            "lang": out["lang"],
            "n_docs": out["n_docs"].astype("int64"),
            "n_kept": out["sum_kept"].astype("int64"),
            "avg_score": (out["sum_score"] / out["n_docs"]).round(4),
        }
    )
    return df.sort_values("lang").reset_index(drop=True)


def _quality_model_sql() -> str:
    from ..stages.modelscore import score_sql_expr

    return f"""
WITH s AS (SELECT lang, {score_sql_expr('text')} AS score FROM documents)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN score > 1.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       ROUND(AVG(score), 4) AS avg_score
FROM s GROUP BY lang ORDER BY lang
"""


_FASTTEXT_DIR = "/tmp/dc4r_models/fasttext"


def fasttext_doc_labels(sf_dir: str) -> pd.DataFrame:
    """REAL pretrained-model-file inference (stages/fasttext.py): a
    fastText ``.vec``-format model (input word vectors + label output
    vectors, the public word2vec/fastText text format) is generated on
    disk, parsed driver-side, broadcast via ray.put, and applied by an
    actor pool — label = argmax(out[L] · mean of known-token vectors),
    logits rounded to 6 dp, ties to the lexicographically smallest
    label.  The oracle reproduces the identical bag-of-means linear
    head from exploded (token, dim, val) parquet twins of the same
    model files (ref parity: api.py:211-227, tasks.py:173-192)."""
    from ..stages.fasttext import fasttext_classify, make_fixture_model

    paths = make_fixture_model(_FASTTEXT_DIR)
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = fasttext_classify(
        ds,
        paths["vectors_vec"],
        paths["labels_vec"],
        text_col="text",
        keep_cols=("doc_id",),
        concurrency=4,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_FASTTEXT_SQL = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
means AS (
  SELECT t.doc_id, v.dim, AVG(v.val) AS m
  FROM toks t JOIN read_parquet('{_FASTTEXT_DIR}/vectors.parquet') v
    ON v.token = t.tok
  GROUP BY t.doc_id, v.dim
),
logits AS (
  SELECT m.doc_id, h.label, ROUND(SUM(m.m * h.w), 6) AS logit
  FROM means m JOIN read_parquet('{_FASTTEXT_DIR}/labels.parquet') h
    ON h.dim = m.dim
  GROUP BY m.doc_id, h.label
),
all_logits AS (
  SELECT d.doc_id, l.label, COALESCE(g.logit, 0.0) AS logit
  FROM documents d
  CROSS JOIN (SELECT DISTINCT label FROM read_parquet('{_FASTTEXT_DIR}/labels.parquet')) l
  LEFT JOIN logits g ON g.doc_id = d.doc_id AND g.label = l.label
),
best AS (
  SELECT doc_id, label, logit,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY logit DESC, label ASC) AS rn
  FROM all_logits
)
SELECT doc_id, label, logit FROM best WHERE rn = 1 ORDER BY doc_id
"""


def delta_near_dup_docs(sf_dir: str) -> pd.DataFrame:
    """Incremental-ingest FUZZY dedup (complement of delta_novel_docs'
    exact fingerprints): for each doc in the delta batch (the perturbed
    copies, ids ≥ 10M), its best near-dup in the base corpus by exact
    word-3-shingle Jaccard ≥ 0.9 — LSH candidates only, base↔delta
    pairs filtered by id arithmetic (delta ids are disjoint by
    construction), argmax per delta doc with (max jac, min base id)
    tie-break.  The cross-corpus pair set never touches the driver until
    the final per-delta winners (one row per delta doc)."""
    pairs = minhash_lsh_pairs(
        _augmented_docs(sf_dir),
        "doc_id",
        "text",
        threshold=0.9,
        num_perm=64,
        bands=16,
        k=3,
        verify="exact",
        payload_mode="auto",
    )

    def cross_only(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        keep = (a < 10_000_000) & (b >= 10_000_000)  # id_a < id_b always
        sub = batch.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": sub["id_b"],
                "base_id": sub["id_a"],
                "jac": sub["jac"],
            }
        )

    def best(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["jac", "base_id"], ascending=[False, True], kind="mergesort")
        return g.head(1)[["doc_id", "base_id", "jac"]]

    out = (
        pairs.map_batches(cross_only, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(best)
        .to_pandas()
    )
    out["jac"] = out["jac"].round(4)
    return out.sort_values("doc_id").reset_index(drop=True)


_DELTA_NEAR_DUP_SQL = """
WITH delta AS (
  SELECT doc_id + 10000000 AS doc_id,
         array_to_string((string_split(text, ' '))[1:len(string_split(text, ' '))-1], ' ') AS text
  FROM documents WHERE doc_id % 10 = 0
),
wb AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS w FROM documents),
wd AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS w FROM delta),
sb AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w)-1)])
              ELSE [array_to_string(w, ' ')] END AS s
  FROM wb WHERE len(w) >= 1
),
sd AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w)-1)])
              ELSE [array_to_string(w, ' ')] END AS s
  FROM wd WHERE len(w) >= 1
),
j AS (
  SELECT d.doc_id, b.doc_id AS base_id,
         CAST(len(list_intersect(d.s, b.s)) AS DOUBLE)
           / len(list_distinct(d.s || b.s)) AS jac
  FROM sd d JOIN sb b ON TRUE
  WHERE CAST(len(list_intersect(d.s, b.s)) AS DOUBLE)
          / len(list_distinct(d.s || b.s)) >= 0.9
),
best AS (
  SELECT doc_id, base_id, jac,
         -- engine's minhash_lsh_pairs emits jac pre-rounded to 4dp, so the
         -- argmax must order by the ROUNDED value or a rounded tie would
         -- pick a different base_id than the engine's (jac desc, id asc)
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY ROUND(jac, 4) DESC, base_id) AS rn
  FROM j
)
SELECT doc_id, base_id, ROUND(jac, 4) AS jac
FROM best WHERE rn = 1 ORDER BY doc_id
"""


def dup_span_pairs(sf_dir: str) -> pd.DataFrame:
    """Exact duplicate-span detection (stages/dupspans): doc pairs
    sharing ≥1 verbatim word 13-gram, with the exact distinct shared
    count — the exact-substring dedup family member (Lee et al. 2021),
    complementing MinHash (similar docs) with verbatim-passage overlap.
    Run over documents ∪ perturbed copies so the planted copies (which
    share all their 13-grams with their base doc) make the result
    non-trivial."""
    from ..stages.dupspans import duplicate_span_pairs

    out = duplicate_span_pairs(
        _augmented_docs(sf_dir), "doc_id", "text", n=13, max_docs_per_gram=64
    ).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# 13-gram self-join oracle over the same augmented corpus; the engine's
# boilerplate cap (drop grams in >64 docs as PAIR GENERATORS, while
# n_shared still counts every shared gram) is reproduced by the `elig`
# semi-join.  O(N²)-ish SQL by design — exactness reference at gate
# scale; the engine stays O(grams + candidate pairs).
_DUP_SPANS_SQL = """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id,
         array_to_string((string_split(text, ' '))[1:len(string_split(text, ' '))-1], ' ') AS text
  FROM documents WHERE doc_id % 10 = 0
),
w AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS w FROM aug),
g AS (
  SELECT doc_id,
         list_distinct([array_to_string(w[i:i+12], ' ') for i in range(1, len(w) - 11)]) AS gs
  FROM w WHERE len(w) >= 13
),
eg AS (SELECT doc_id, UNNEST(gs) AS gram FROM g),
df AS (SELECT gram, COUNT(DISTINCT doc_id) AS d FROM eg GROUP BY gram),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(DISTINCT a.gram) AS n_shared
  FROM eg a JOIN eg b ON a.gram = b.gram AND b.doc_id > a.doc_id
  GROUP BY 1, 2
),
elig AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM eg a JOIN eg b ON a.gram = b.gram AND b.doc_id > a.doc_id
  WHERE a.gram IN (SELECT gram FROM df WHERE d <= 64)
)
SELECT s.id_a, s.id_b, s.n_shared
FROM shared s JOIN elig e ON s.id_a = e.id_a AND s.id_b = e.id_b
ORDER BY s.id_a, s.id_b
"""


def _ensure_wet_fixture(sf_dir: str, n_files: int = 8) -> str:
    """documents.parquet → a directory of spec-conformant multi-member
    .warc.wet.gz files (one gzip member per record, Common-Crawl
    layout), deterministic and cached by the parquet's mtime+size."""
    import hashlib
    import os as _os
    import shutil

    import pyarrow.parquet as pq

    from ..sources.warc import write_wet_file

    doc_path = _p(sf_dir, "documents")
    st = _os.stat(doc_path)
    key = f"{sf_dir}|{st.st_mtime_ns}|{st.st_size}"
    out_dir = f"/tmp/dc4r_wet/{hashlib.md5(key.encode()).hexdigest()[:12]}"
    done = f"{out_dir}/_DONE"
    if not _os.path.exists(done):
        shutil.rmtree(out_dir, ignore_errors=True)
        _os.makedirs(out_dir, exist_ok=True)
        t = pq.read_table(doc_path, columns=["doc_id", "text"])
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        for k in range(n_files):
            sel = [(i, tx) for i, tx in zip(ids, texts) if i % n_files == k]
            write_wet_file(
                f"{out_dir}/part-{k:02d}.warc.wet.gz",
                [f"https://docs.example/{i}" for i, _ in sel],
                [tx for _, tx in sel],
            )
        open(done, "w").close()
    return out_dir


def wet_extract(sf_dir: str) -> pd.DataFrame:
    """Common-Crawl WET ingestion (sources/warc): the corpus serialized
    as multi-member-gzip WARC/1.0 conversion records is read back by
    the from-scratch Ray datasource (one read task per archive, records
    streamed into bounded Arrow batches) — per-record byte identity
    proven by md5 + utf-8 byte length against the source parquet."""
    from ..functions.hashing import md5_hex_many
    from ..sources.warc import read_wet

    wet_dir = _ensure_wet_fixture(sf_dir)
    ds = read_wet(wet_dir)

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch["url"],
                "text_md5": pa.array(md5_hex_many(batch["text"].to_pylist()), pa.string()),
                "n_bytes": batch["content_length"],
            }
        )

    df = ds.map_batches(fin, batch_format="pyarrow").to_pandas()
    return df.sort_values("url").reset_index(drop=True)


_WET_EXTRACT_SQL = """
SELECT 'https://docs.example/' || CAST(doc_id AS VARCHAR) AS url,
       md5(text) AS text_md5,
       octet_length(encode(text)) AS n_bytes
FROM documents ORDER BY url
"""


def _ensure_warc_fixture(n_files: int = 4) -> str:
    """tiny-corpus pages → a directory of full .warc.gz archives of
    ``response`` records (HTTP block + WARC-Record-ID + payload digest),
    deterministic and cached — the raw-capture twin of the WET fixture."""
    import hashlib
    import os as _os
    import shutil

    from ..sources.corpus import ensure
    from ..sources.warc import write_warc_file

    corpus = ensure("tiny")
    st_key = corpus  # corpus dir is itself content-addressed + _DONE-gated
    out_dir = f"/tmp/dc4r_warc/{hashlib.md5(st_key.encode()).hexdigest()[:12]}"
    done = f"{out_dir}/_DONE"
    if not _os.path.exists(done):
        shutil.rmtree(out_dir, ignore_errors=True)
        _os.makedirs(out_dir, exist_ok=True)
        t = rd.read_parquet(f"{corpus}/pages", columns=["url", "html"]).to_pandas()
        t = t.sort_values("url").reset_index(drop=True)
        for k in range(n_files):
            sel = t.iloc[k::n_files]
            write_warc_file(
                f"{out_dir}/part-{k:02d}.warc.gz",
                sel["url"].tolist(),
                sel["html"].tolist(),
            )
        open(done, "w").close()
    return out_dir


def warc_response_extract(sf_dir: str) -> pd.DataFrame:
    """Common-Crawl RAW-capture ingestion (sources/warc
    WarcResponseDatasource): full .warc.gz archives of ``response``
    records are read back — HTTP status/headers/body split per record,
    WARC-Payload-Digest and WARC-Record-ID verified — then the engine's
    own extractor runs over the recovered html.  The oracle recomputes
    md5(text)/octet_length(html) from the source corpus (byte-identical
    extraction by construction) and pins digest_ok/record_id_ok = 1 for
    EVERY record (the engine computes them by re-hashing; a corrupted
    archive flips them — tested in test_warc.py)."""
    from ..functions.extract import extract_text
    from ..functions.hashing import md5_hex_many
    from ..sources.warc import read_warc_responses

    warc_dir = _ensure_warc_fixture()
    ds = read_warc_responses(warc_dir)

    def fin(batch: pa.Table) -> pa.Table:
        texts = [extract_text(h) for h in batch["html"].to_pylist()]
        return pa.table(
            {
                "url": batch["url"],
                "http_status": pc.cast(batch["http_status"], pa.int64()),
                "text_md5": pa.array(md5_hex_many(texts), pa.string()),
                "n_bytes": batch["content_length"],
                "digest_ok": pc.cast(batch["digest_ok"], pa.int64()),
                "record_id_ok": pc.cast(batch["record_id_ok"], pa.int64()),
            }
        )

    df = ds.map_batches(fin, batch_format="pyarrow").to_pandas()
    return df.sort_values("url").reset_index(drop=True)


_WARC_RESPONSE_SQL = f"""
SELECT url,
       CAST(200 AS BIGINT) AS http_status,
       md5(text) AS text_md5,
       CAST(octet_length(html) AS BIGINT) AS n_bytes,
       CAST(1 AS BIGINT) AS digest_ok,
       CAST(1 AS BIGINT) AS record_id_ok
FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet')
ORDER BY url
"""


def span_removed_docs(sf_dir: str) -> pd.DataFrame:
    """Duplicate-span REMOVAL (stages/dupspans.remove_duplicate_spans):
    the Lee et al. / RefinedWeb exact-substring cleaning step — every
    token covered by a word 13-gram appearing in ≥2 distinct documents
    is deleted; output is the md5 of the cleaned token stream per doc
    (byte-level oracle check) plus the kept-token count.  Over the same
    augmented corpus as dup_span_pairs so the planted copies make the
    removal non-trivial."""
    from ..functions.hashing import md5_hex
    from ..stages.dupspans import remove_duplicate_spans

    out = remove_duplicate_spans(
        _augmented_docs(sf_dir), "doc_id", "text", n=13, min_df=2
    )

    def finish(batch: pa.Table) -> pa.Table:
        cleaned = batch["cleaned"].to_pylist()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "cleaned_md5": pa.array([md5_hex(c) for c in cleaned], pa.string()),
                "n_kept": pa.array(
                    [0 if not c else c.count(" ") + 1 for c in cleaned], pa.int64()
                ),
            }
        )

    df = out.map_batches(finish, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


# token-level removal oracle over the same augmented corpus: positions
# covered by any df>=2 13-gram window are dropped, survivors rejoined
# with single spaces (array_to_string([]) is NULL in DuckDB — coalesce
# to '' so fully-covered docs hash like the engine's empty string).
_SPAN_REMOVED_SQL = r"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id,
         array_to_string((string_split(text, ' '))[1:len(string_split(text, ' '))-1], ' ') AS text
  FROM documents WHERE doc_id % 10 = 0
),
w AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w FROM aug),
g AS (
  SELECT doc_id,
         UNNEST([i for i in range(1, len(w) - 11)]) AS i,
         UNNEST([array_to_string(w[i:i+12], ' ') for i in range(1, len(w) - 11)]) AS gram
  FROM w WHERE len(w) >= 13
),
dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
cov0 AS (SELECT g.doc_id, UNNEST([p for p in range(g.i, g.i + 13)]) AS p FROM g JOIN dup USING (gram)),
covl AS (SELECT doc_id, list(DISTINCT p) AS ps FROM cov0 GROUP BY doc_id),
clean AS (
  SELECT w.doc_id,
         [w.w[p] for p in range(1, len(w.w) + 1)
          if NOT list_contains(coalesce(c.ps, CAST([] AS BIGINT[])), p)] AS kept
  FROM w LEFT JOIN covl c USING (doc_id)
)
SELECT doc_id,
       md5(coalesce(array_to_string(kept, ' '), '')) AS cleaned_md5,
       len(kept) AS n_kept
FROM clean ORDER BY doc_id
"""


def chunked_docs(sf_dir: str) -> pd.DataFrame:
    """Fixed-size chunk splitter (stages/chunk): the reference's
    4096-char result chunker (utils.py:345-358, chunk_index /
    total_chunks) as a columnar flat transform — here at size=128 so
    the sf corpus yields multi-chunk docs.  One map_batches pass,
    vectorized per chunk index; the training-data document chunker."""
    from ..stages.chunk import chunk_text

    out = chunk_text(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        "doc_id",
        "text",
        size=128,
    ).to_pandas()
    return out.sort_values(["doc_id", "chunk_index"]).reset_index(drop=True)


_CHUNKED_DOCS_SQL = """
WITH d AS (
  SELECT doc_id, text,
         greatest(1, CAST(ceil(length(text) / 128.0) AS BIGINT)) AS total_chunks
  FROM documents
),
e AS (
  SELECT doc_id, text, total_chunks,
         UNNEST(range(total_chunks)) AS chunk_index
  FROM d
)
SELECT doc_id, chunk_index, total_chunks,
       substring(text, CAST(chunk_index * 128 + 1 AS BIGINT), 128) AS chunk
FROM e ORDER BY doc_id, chunk_index
"""


def crawl_snapshot_diff(sf_dir: str) -> pd.DataFrame:
    """Incremental-recrawl diff (stages/snapshot): added / removed /
    changed keys between two crawl snapshots.  The 'new' snapshot is
    synthesized deterministically from documents: doc_id % 7 == 0
    removed, % 10 == 0 (and not removed) perturbed (last word dropped),
    and a copy at doc_id + 10M added for % 13 == 0.  Only slim
    (key, md5) rows shuffle through the FULL OUTER bucketed join;
    unchanged keys are dropped bucket-side."""
    from ..stages.snapshot import snapshot_diff

    old = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def make_new(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        kept = batch.filter(pa.array(ids % 7 != 0))
        kids = kept["doc_id"].to_numpy(zero_copy_only=False)
        texts = [
            " ".join(t.split(" ")[:-1]) if i % 10 == 0 else t
            for i, t in zip(kids, kept["text"].to_pylist())
        ]
        added = batch.filter(pa.array(ids % 13 == 0))
        return pa.table(
            {
                "doc_id": pa.concat_arrays(
                    [
                        kept["doc_id"].combine_chunks(),
                        pc.add(added["doc_id"], 10_000_000).combine_chunks(),
                    ]
                ),
                "text": pa.array(texts + added["text"].to_pylist(), pa.string()),
            }
        )

    new = old.map_batches(make_new, batch_format="pyarrow")
    out = snapshot_diff(old, new, "doc_id", "text").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


_SNAPSHOT_DIFF_SQL = """
WITH old AS (SELECT doc_id, md5(text) AS h FROM documents),
new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 10 = 0
              THEN array_to_string((string_split(text, ' '))[1:len(string_split(text, ' '))-1], ' ')
              ELSE text END) AS h
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, md5(text) AS h
  FROM documents WHERE doc_id % 13 = 0
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.h IS NULL THEN 'added'
            WHEN n.h IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM old o FULL JOIN new n ON o.doc_id = n.doc_id
WHERE o.h IS NULL OR n.h IS NULL OR o.h <> n.h
ORDER BY doc_id
"""


# per-source mixture weights (¼..1 by source index) — the "data recipe"
# a pretraining run would configure; the SQL oracle is generated from
# this same dict so engine and oracle can never drift.
_MIXTURE_RATES = {f"src{i}": ((i % 4) + 1) / 4 for i in range(20)}


def mixture_sampled_docs(sf_dir: str) -> pd.DataFrame:
    """Source-weighted mixture sampling (stages/sample.mixture_sample):
    per-source keep-rates broadcast once via ray.put, per-row decision a
    pure hash function of (doc_id) — deterministic, shuffle-free,
    split-invariant domain reweighting."""
    from ..stages.sample import mixture_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    out = mixture_sample(ds, "source", "doc_id", _MIXTURE_RATES).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _mixture_sql() -> str:
    from ..stages.sample import mixture_sample_sql_case

    case = mixture_sample_sql_case(_MIXTURE_RATES, "source", "doc_id")
    return f"SELECT doc_id, source FROM documents WHERE {case} ORDER BY doc_id"


def weighted_doc_sample(sf_dir: str) -> pd.DataFrame:
    """Length-weighted reproducible document sample (stages/sample.
    weighted_sample_topk): sequential Poisson sampling with weight
    n_chars — the token-budget-aware subset draw (long docs
    proportionally likelier, P ≈ k·w/Σw).  Key u/w uses only IEEE
    correctly-rounded ops (md5-hex→uint64→float64, divide), so the SQL
    oracle reproduces the exact 500-row set AND bit-identical key
    doubles.  Map-side per-block prune to k keeps the sort at
    O(k·blocks) rows."""
    from ..stages.sample import weighted_sample_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "source", "n_chars"])
    out = weighted_sample_topk(
        ds, "doc_id", "n_chars", k=500,
        keep_cols=["doc_id", "lang", "source", "n_chars"],
    ).to_pandas()
    return out.sort_values(["sample_key", "doc_id"]).reset_index(drop=True)


_WEIGHTED_SAMPLE_SQL = """
SELECT doc_id, lang, source, n_chars,
       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT)
         / CAST(n_chars AS DOUBLE) AS sample_key
FROM documents
ORDER BY sample_key, doc_id
LIMIT 500
"""


def anchor_text_agg(sf_dir: str) -> pd.DataFrame:
    """Anchor-text aggregation over the tiny-corpus link graph
    (stages/anchors): per link TARGET, total anchor tokens, distinct
    terms, and the dominant anchor term.  HTML never shuffles — pages
    reduce to slim (dst, term, cnt) partials in map_batches; one
    groupby sum + a per-target argmax.  The oracle reproduces the same
    regex extraction (group 1 = href, group 2 = anchor text) and
    resolution CASE that crawl_reachability already hash-pins."""
    from ..sources.corpus import ensure
    from ..stages.anchors import anchor_term_stats

    corpus = ensure("tiny")
    pages = rd.read_parquet(f"{corpus}/pages", columns=["url", "html"])
    df = anchor_term_stats(pages).to_pandas()
    for c in ("n_anchor_tokens", "n_terms", "top_term_count"):
        df[c] = df[c].astype("int64")
    return df.sort_values("dst").reset_index(drop=True)


def _anchor_sql() -> str:
    from ..stages.anchors import ANCHOR_RE_SQL

    rx = ANCHOR_RE_SQL.replace("'", "''")
    return rf"""
WITH pages AS (
  SELECT url, decode(html) AS html,
         regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host
  FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet')
),
raw AS (
  SELECT p.host, pr[1] AS href, pr[2] AS anchor
  FROM pages p, UNNEST(list_zip(
      regexp_extract_all(p.html, '{rx}', 1),
      regexp_extract_all(p.html, '{rx}', 2))) AS z(pr)
),
links AS (
  SELECT CASE WHEN href LIKE 'http%' THEN href
              WHEN href = '/' THEN 'https://' || host
              ELSE 'https://' || host || href END AS dst,
         anchor
  FROM raw
),
terms AS (
  SELECT dst, t.term
  FROM links, UNNEST(regexp_extract_all(lower(anchor), '[a-z0-9]+')) AS t(term)
),
counts AS (SELECT dst, term, COUNT(*) AS cnt FROM terms GROUP BY dst, term),
ranked AS (
  SELECT dst, term, cnt,
         ROW_NUMBER() OVER (PARTITION BY dst ORDER BY cnt DESC, term) AS rn,
         SUM(cnt) OVER (PARTITION BY dst) AS tot,
         COUNT(*) OVER (PARTITION BY dst) AS nt
  FROM counts)
SELECT dst, CAST(tot AS BIGINT) AS n_anchor_tokens, CAST(nt AS BIGINT) AS n_terms,
       term AS top_term, CAST(cnt AS BIGINT) AS top_term_count
FROM ranked WHERE rn = 1 ORDER BY dst
"""


def c4_cleaned_pages(sf_dir: str) -> pd.DataFrame:
    """C4-style line-level cleaning over the tiny-corpus extracted text
    (stages/c4filter): drop headings and lines under 5 words, drop docs
    with fewer than 2 surviving lines; per doc report non-blank /kept
    line counts and the md5 of the cleaned text.  Shuffle-free — one
    vectorized map_batches pass."""
    from ..sources.corpus import ensure
    from ..stages.c4filter import c4_line_stats

    corpus = ensure("tiny")
    pages = rd.read_parquet(f"{corpus}/pages", columns=["url", "text"])
    df = c4_line_stats(pages, "url", "text", min_words=5, min_kept=2).to_pandas()
    for c in ("n_lines", "n_kept"):
        df[c] = df[c].astype("int64")
    return df.sort_values("url").reset_index(drop=True)


_C4_CLEAN_SQL = rf"""
WITH pages AS (SELECT url, text FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet')),
l AS (
  SELECT url,
    length(list_filter(string_split(text, chr(10)),
           x -> length(regexp_extract_all(x, '\S+')) > 0)) AS n_lines,
    list_filter(string_split(text, chr(10)),
           x -> length(regexp_extract_all(x, '\S+')) >= 5 AND NOT starts_with(x, '#')) AS kept
  FROM pages)
SELECT url, CAST(n_lines AS BIGINT) AS n_lines, CAST(length(kept) AS BIGINT) AS n_kept,
       md5(list_aggregate(kept, 'string_agg', chr(10))) AS clean_md5
FROM l WHERE length(kept) >= 2 ORDER BY url
"""


def cdx_host_lookup(sf_dir: str) -> pd.DataFrame:
    """CDX-style SURT-sorted URL index (stages/cdx): build once (global
    sort of the slim (url, warc_ts, surt) capture table + per-file
    range manifest from parquet footers), then answer a host-prefix
    lookup reading ONLY the manifest-intersecting files.  The index is
    cached under /tmp keyed by the corpus generation (mtime+size), the
    knn_ivf discipline."""
    import hashlib
    import shutil

    from ..sources.corpus import ensure
    from ..stages.cdx import build_cdx_index, cdx_prefix_lookup, surt_prefix_for_host

    corpus = ensure("tiny")
    import glob as _glob
    import os as _os

    pages_files = sorted(_glob.glob(f"{corpus}/pages/*.parquet"))
    sig = "|".join(f"{f}:{_os.stat(f).st_mtime_ns}:{_os.stat(f).st_size}" for f in pages_files)
    idx_dir = f"/tmp/dc4r_cdx_index/{hashlib.md5(sig.encode()).hexdigest()[:12]}"
    done = f"{idx_dir}/_DONE"
    if not _os.path.exists(done):
        shutil.rmtree(idx_dir, ignore_errors=True)
        pages = rd.read_parquet(f"{corpus}/pages", columns=["url", "warc_ts"])
        build_cdx_index(pages, idx_dir, "url", keep_cols=["url", "warc_ts"])
        open(done, "w").close()
    out = cdx_prefix_lookup(idx_dir, surt_prefix_for_host("host-7.example")).to_pandas()
    return out[["surt", "url", "warc_ts"]].sort_values("surt").reset_index(drop=True)


_CDX_SQL = rf"""
WITH pages AS (
  SELECT url, warc_ts,
         regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
         coalesce(regexp_extract(url, '^[a-z]+://[^/]+(/.*)$', 1), '') AS path
  FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet')
)
SELECT array_to_string(list_reverse(string_split(host, '.')), ',') || ')' || path AS surt,
       url, warc_ts
FROM pages
WHERE host = 'host-7.example'
ORDER BY surt
"""


def temperature_lang_sample(sf_dir: str) -> pd.DataFrame:
    """Temperature-balanced language sampling (stages/sample
    .temperature_sample, the mT5/XLM-R T=2 rule): per-lang targets
    c_g = floor(frac·N·q_g) with q_g ∝ sqrt(p_g), drawn by the
    deterministic md5-order pick.  Head languages are down-sampled,
    tail languages kept — the multilingual-balance step of a
    pretraining recipe."""
    from ..stages.sample import temperature_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    out = temperature_sample(ds, "lang", "doc_id", frac=0.5).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


_TEMPERATURE_SQL = """
WITH cnt AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
tot AS (SELECT SUM(n) * 1.0 AS nt FROM cnt),
qq AS (
  SELECT lang, n,
         ROUND(sqrt(n / (SELECT nt FROM tot))
               / SUM(sqrt(n / (SELECT nt FROM tot))) OVER (), 12) AS q
  FROM cnt),
tgt AS (
  SELECT lang, LEAST(n, CAST(floor(0.5 * (SELECT nt FROM tot) * q) AS BIGINT)) AS c
  FROM qq),
ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents)
SELECT r.doc_id, r.lang
FROM ranked r JOIN tgt t ON t.lang = r.lang
WHERE r.rn <= t.c ORDER BY r.doc_id
"""


def recrawl_priority_plan(sf_dir: str) -> pd.DataFrame:
    """Change-rate recrawl planner (stages/snapshot.recrawl_priority):
    three deterministic snapshots of documents (s1 drops the last word
    for doc_id % 5 == 0; s2 drops the last TWO words for doc_id % 3 == 0,
    else keeps s1's text), diffed pairwise on slim md5 rows; per-doc
    change counts bucket into hot/warm/cold.  Change detection derives
    from md5 equality, not the perturbation predicate, on both sides."""
    from ..stages.snapshot import recrawl_priority

    base = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def drop_last(texts, k):
        out = []
        for t in texts:
            w = (t or "").split(" ")
            out.append(" ".join(w[: max(0, len(w) - k)]))
        return out

    def make_s1(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        d1 = drop_last(texts, 1)
        out = [d1[i] if ids[i] % 5 == 0 else texts[i] for i in range(len(texts))]
        return pa.table({"doc_id": batch["doc_id"], "text": pa.array(out, pa.string())})

    def make_s2(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        d1 = drop_last(texts, 1)
        d2 = drop_last(texts, 2)
        out = [
            d2[i] if ids[i] % 3 == 0 else (d1[i] if ids[i] % 5 == 0 else texts[i])
            for i in range(len(texts))
        ]
        return pa.table({"doc_id": batch["doc_id"], "text": pa.array(out, pa.string())})

    s1 = base.map_batches(make_s1, batch_format="pyarrow")
    s2 = base.map_batches(make_s2, batch_format="pyarrow")
    out = recrawl_priority([base, s1, s2], "doc_id", "text").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_changes"] = out["n_changes"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


_RECRAWL_SQL = """
WITH s AS (
  SELECT doc_id, text AS s0,
    CASE WHEN doc_id % 5 = 0
         THEN array_to_string((string_split(text, ' '))[1:len(string_split(text, ' '))-1], ' ')
         ELSE text END AS s1,
    CASE WHEN doc_id % 3 = 0
         THEN array_to_string((string_split(text, ' '))[1:len(string_split(text, ' '))-2], ' ')
         WHEN doc_id % 5 = 0
         THEN array_to_string((string_split(text, ' '))[1:len(string_split(text, ' '))-1], ' ')
         ELSE text END AS s2
  FROM documents),
n AS (
  SELECT doc_id,
         (CASE WHEN md5(s0) <> md5(s1) THEN 1 ELSE 0 END
          + CASE WHEN md5(s1) <> md5(s2) THEN 1 ELSE 0 END) AS n_changes
  FROM s)
SELECT doc_id, CAST(n_changes AS BIGINT) AS n_changes,
       CASE WHEN n_changes >= 2 THEN 'hot'
            WHEN n_changes >= 1 THEN 'warm'
            ELSE 'cold' END AS priority
FROM n ORDER BY doc_id
"""


def dup_cluster_reps(sf_dir: str) -> pd.DataFrame:
    """Keep-policy over near-dup clusters (stages/dedup
    .cluster_representatives): per cluster keep the member with the
    most tokens (ties → smallest doc_id) — score-wins dedup, the real
    training-data keep rule (vs J5's first-wins).  Composition:
    minhash pairs → connected components → slim (id, ntok) join →
    per-cluster argmax."""
    from ..stages.dedup import cluster_representatives, connected_components

    pairs = minhash_near_dups(sf_dir)
    labels = connected_components(pairs)
    aug = _augmented_docs(sf_dir)

    def ntok(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "ntok": pc.count_substring_regex(t["text"], pattern=r"\w+"),
            }
        )

    scores = aug.map_batches(ntok, batch_format="pyarrow")
    out = cluster_representatives(labels, scores, "doc_id", "ntok").to_pandas()
    for c in ("component", "rep_doc_id", "cluster_size"):
        out[c] = out[c].astype("int64")
    out["rep_ntok"] = out["rep_ntok"].astype("float64")
    return out.sort_values("component").reset_index(drop=True)


_DUP_CLUSTER_REPS_SQL = """
WITH RECURSIVE aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id,
         array_to_string((string_split(text, ' '))[1:len(string_split(text, ' '))-1], ' ') AS text
  FROM documents WHERE doc_id % 10 = 0
),
w AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS w FROM aug),
sh AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w)-1)])
              ELSE [array_to_string(w, ' ')] END AS s
  FROM w WHERE len(w) >= 1
),
edges AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON b.doc_id > a.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / len(list_distinct(a.s || b.s)) >= 0.9
),
sym AS (SELECT id_a AS a, id_b AS b FROM edges UNION SELECT id_b, id_a FROM edges),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a
),
comp AS (SELECT a AS node, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a),
ntok AS (SELECT doc_id, len(regexp_extract_all(lower(text), '\\w+')) AS ntok FROM aug),
r AS (
  SELECT c.component, c.node, t.ntok,
         ROW_NUMBER() OVER (PARTITION BY c.component ORDER BY t.ntok DESC, c.node) AS rn,
         COUNT(*) OVER (PARTITION BY c.component) AS sz
  FROM comp c JOIN ntok t ON t.doc_id = c.node)
SELECT component, node AS rep_doc_id, CAST(sz AS BIGINT) AS cluster_size,
       CAST(ntok AS DOUBLE) AS rep_ntok
FROM r WHERE rn = 1 ORDER BY component
"""


def link_degree_stats(sf_dir: str) -> pd.DataFrame:
    """Link-graph degree rollup per target host: distinct link targets,
    total inlinks, and the max indegree of any single page — the
    graph-shape report that sizes frontier salting and PageRank skew.
    HTML reduces to slim DISTINCT (src, dst) edges in map_batches (the
    same extract_links the crawler runs, parity pinned by
    crawl_reachability); one groupby(dst) count + one per-host rollup."""
    from ray.data.aggregate import Count, Max, Sum

    from ..functions.extract import extract_links
    from ..functions.urlnorm import host_of
    from ..sources.corpus import ensure

    corpus = ensure("tiny")
    pages = rd.read_parquet(f"{corpus}/pages", columns=["url", "html"])

    indeg = (
        pages.map_batches(_link_edges, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="__dup"))  # distinct (src,dst)
        .groupby("dst")
        .aggregate(Count(alias_name="indegree"))
    )

    def add_host(t: pa.Table) -> pa.Table:
        hosts = [host_of(u) for u in t["dst"].to_pylist()]
        return t.append_column("host", pa.array(hosts, pa.string()))

    out = (
        indeg.map_batches(add_host, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Count(alias_name="n_targets"),
            Sum("indegree", alias_name="total_inlinks"),
            Max("indegree", alias_name="max_indegree"),
        )
        .to_pandas()
    )
    for c in ("n_targets", "total_inlinks", "max_indegree"):
        out[c] = out[c].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


_LINK_DEGREE_SQL = rf"""
WITH pages AS (
  SELECT url, decode(html) AS html,
         regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host
  FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet')
),
links AS (
  SELECT DISTINCT p.url AS src,
         CASE WHEN href LIKE 'http%' THEN href
              WHEN href = '/' THEN 'https://' || p.host
              ELSE 'https://' || p.host || href END AS dst
  FROM pages p, UNNEST(regexp_extract_all(p.html,
       '<a\s[^>]*?href\s*=\s*["'']([^"''<>]+)["'']', 1)) AS u(href)
),
indeg AS (SELECT dst, COUNT(*) AS indegree FROM links GROUP BY dst)
SELECT regexp_extract(dst, '^[a-z]+://([^/]+)', 1) AS host,
       COUNT(*) AS n_targets,
       CAST(SUM(indegree) AS BIGINT) AS total_inlinks,
       MAX(indegree) AS max_indegree
FROM indeg GROUP BY host ORDER BY host
"""


#: Gopher-style quality-gate thresholds (Rae et al. 2021, Table A1,
#: adapted to this corpus's scale): token count window, mean-word-length
#: window, repetition caps, minimum stopword occurrences.
_GOPHER_RULES = dict(min_tok=30, max_tok=100_000, min_wl=3.0, max_wl=10.0, max_rep=0.2, min_stop=2)
_GOPHER_STOPWORDS = ("the", "a")


def _tok_hashes(toks_list):
    """Hash precomputed token lists (one C siphash pass per doc) — lets
    the Gopher kernels tokenize ONCE for both the string rules
    (word length, stopwords) and the hash-based repetition rules."""
    return [
        pd.util.hash_array(np.asarray(tk, dtype=object), categorize=False)
        if tk
        else np.empty(0, dtype=np.uint64)
        for tk in toks_list
    ]


def make_gopher_keep_fn(text_col: str = "text", **rule_overrides):
    """map_batches KEEP filter applying the 5 Gopher rules per doc —
    the flagship gate kernel, shared by training_data_pipeline and
    scripts/scale_proof.py (rule semantics pinned by the
    gopher_quality_gate SQL oracle).  ``rule_overrides`` replaces
    individual _GOPHER_RULES entries (the scale proof sets min_stop=0:
    its synthetic corpus vocabulary has no English stopwords)."""
    import re as _re

    from ..functions.repetition import repetition_stats_from_hashes

    word_re = _re.compile(r"\w+")
    R = {**_GOPHER_RULES, **rule_overrides}
    stops = set(_GOPHER_STOPWORDS)

    def gate(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        toks_list = [word_re.findall((t or "").lower()) for t in texts]
        st = repetition_stats_from_hashes(_tok_hashes(toks_list))
        keep = np.zeros(len(texts), dtype=bool)
        for i, toks in enumerate(toks_list):
            ntok = len(toks)
            mwl = (sum(len(x) for x in toks) / ntok) if ntok else 0.0
            nstop = sum(1 for x in toks if x in stops)
            keep[i] = (
                R["min_tok"] <= ntok <= R["max_tok"]
                and R["min_wl"] <= mwl <= R["max_wl"]
                and not (st["top2_frac"][i] > R["max_rep"] or st["dup3_frac"][i] > R["max_rep"])
                and nstop >= R["min_stop"]
            )
        return batch.filter(pa.array(keep))

    return gate


def gopher_quality_gate(sf_dir: str) -> pd.DataFrame:
    """The composed Gopher-style quality GATE (Rae et al. 2021): five
    rules per doc — token-count window, mean-word-length window,
    top-2-gram coverage cap, duplicate-3-gram cap, minimum stopword
    count — rolled up per lang with per-rule failure counts.  Entirely
    map-side + one partial-agg groupby; every rule is a pure function
    of the text so the whole multi-rule gate is hash-checked in SQL."""
    import re as _re

    from ..functions.repetition import repetition_stats_from_hashes
    from ..stages.agg import partial_grouped_sum

    ds = _read(sf_dir, "documents", columns=["lang", "text"])
    word_re = _re.compile(r"\w+")
    R = _GOPHER_RULES
    stops = set(_GOPHER_STOPWORDS)

    def metrics(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        toks_list = [word_re.findall((t or "").lower()) for t in texts]
        st = repetition_stats_from_hashes(_tok_hashes(toks_list))
        n = len(texts)
        fail_len = np.zeros(n, dtype=np.int64)
        fail_wl = np.zeros(n, dtype=np.int64)
        fail_rep = np.zeros(n, dtype=np.int64)
        fail_stop = np.zeros(n, dtype=np.int64)
        kept = np.zeros(n, dtype=np.int64)
        for i, toks in enumerate(toks_list):
            ntok = len(toks)
            mwl = (sum(len(x) for x in toks) / ntok) if ntok else 0.0
            nstop = sum(1 for x in toks if x in stops)
            f_len = not (R["min_tok"] <= ntok <= R["max_tok"])
            f_wl = not (R["min_wl"] <= mwl <= R["max_wl"])
            f_rep = st["top2_frac"][i] > R["max_rep"] or st["dup3_frac"][i] > R["max_rep"]
            f_stop = nstop < R["min_stop"]
            fail_len[i], fail_wl[i] = f_len, f_wl
            fail_rep[i], fail_stop[i] = f_rep, f_stop
            kept[i] = not (f_len or f_wl or f_rep or f_stop)
        return pa.table(
            {
                "lang": batch["lang"],
                "kept": pa.array(kept),
                "f_len": pa.array(fail_len),
                "f_wl": pa.array(fail_wl),
                "f_rep": pa.array(fail_rep),
                "f_stop": pa.array(fail_stop),
            }
        )

    out = partial_grouped_sum(
        ds.map_batches(metrics, batch_format="pyarrow"),
        ["lang"],
        sums=["kept", "f_len", "f_wl", "f_rep", "f_stop"],
        count_alias="n_docs",
    ).to_pandas()
    df = pd.DataFrame(
        {
            "lang": out["lang"],
            "n_docs": out["n_docs"].astype("int64"),
            "n_kept": out["sum_kept"].astype("int64"),
            "n_fail_len": out["sum_f_len"].astype("int64"),
            "n_fail_wordlen": out["sum_f_wl"].astype("int64"),
            "n_fail_rep": out["sum_f_rep"].astype("int64"),
            "n_fail_stop": out["sum_f_stop"].astype("int64"),
        }
    )
    # no rounded ratio column: n_kept/n_docs can land exactly on a .5
    # rounding boundary (e.g. 0.78125) where numpy half-even and DuckDB
    # half-away disagree; the exact integers carry the information
    return df.sort_values("lang").reset_index(drop=True)


def _gopher_sql() -> str:
    R = _GOPHER_RULES
    stop_list = ", ".join(f"'{s}'" for s in _GOPHER_STOPWORDS)
    return f"""
WITH tok AS (
  SELECT doc_id, lang, regexp_extract_all(lower(text), '\\w+') AS w FROM documents
),
g AS (
  SELECT doc_id, lang, len(w) AS n_tok,
         CASE WHEN len(w) = 0 THEN 0.0
              ELSE length(array_to_string(w, '')) * 1.0 / len(w) END AS mwl,
         len(list_filter(w, x -> x IN ({stop_list}))) AS n_stop,
         [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))] AS g2,
         [w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)] AS g3
  FROM tok
),
t2 AS (
  SELECT doc_id, MAX(c) AS maxc FROM (
    SELECT doc_id, gram, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(g2) AS gram FROM g) GROUP BY doc_id, gram
  ) GROUP BY doc_id
),
t3 AS (
  SELECT doc_id, 1.0 - COUNT(DISTINCT gram) * 1.0 / COUNT(*) AS dup3
  FROM (SELECT doc_id, unnest(g3) AS gram FROM g) GROUP BY doc_id
),
rules AS (
  SELECT g.lang,
    CASE WHEN g.n_tok BETWEEN {R["min_tok"]} AND {R["max_tok"]} THEN 0 ELSE 1 END AS f_len,
    CASE WHEN g.mwl >= {R["min_wl"]} AND g.mwl <= {R["max_wl"]} THEN 0 ELSE 1 END AS f_wl,
    CASE WHEN (CASE WHEN g.n_tok >= 2 THEN 2.0 * t2.maxc / g.n_tok ELSE 0.0 END) > {R["max_rep"]}
           OR COALESCE(t3.dup3, 0.0) > {R["max_rep"]} THEN 1 ELSE 0 END AS f_rep,
    CASE WHEN g.n_stop >= {R["min_stop"]} THEN 0 ELSE 1 END AS f_stop
  FROM g LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN f_len + f_wl + f_rep + f_stop = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(f_len) AS BIGINT) AS n_fail_len,
       CAST(SUM(f_wl) AS BIGINT) AS n_fail_wordlen,
       CAST(SUM(f_rep) AS BIGINT) AS n_fail_rep,
       CAST(SUM(f_stop) AS BIGINT) AS n_fail_stop
FROM rules GROUP BY lang ORDER BY lang
"""


def training_data_pipeline(sf_dir: str) -> pd.DataFrame:
    """The composed end-to-end training-data pipeline — what a user of
    this engine actually runs over a crawl, as ONE oracle-checked query:

      documents
        → Gopher-style quality gate (the 5 rules of gopher_quality_gate,
          applied as a per-doc KEEP filter)
        → exact dedup, first-wins by content md5 (J5 semantics)
        → near-dup removal: minhash-LSH pairs with exact in-bucket
          Jaccard ≥ 0.9, greedy keep-smallest-id (drop every id_b —
          the standard keep-first-in-corpus-order policy; chains drop
          conservatively, matching the SQL EXISTS semantics exactly)
        → sequence packing at seq_len=128 (two-phase distributed
          prefix sum; stages/pack)

    Every stage is the already-oracle-green component; this entry pins
    their COMPOSITION (filters feeding dedups feeding the pack scan) —
    the integration surface where column/ordering bugs would hide.
    Output: (doc_id, n_tokens, tok_start, seq_first, seq_last) for the
    surviving corpus."""
    from ..stages.dedup import exact_dedup_losers, minhash_lsh_pairs
    from ..stages.join import bloom_semi_anti
    from ..stages.pack import pack_sequences

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    gated = docs.map_batches(make_gopher_keep_fn(), batch_format="pyarrow").materialize()

    # exact first-wins WITHOUT a payload shuffle: only the slim
    # (doc_id, text_hash) pair crosses the wire (exact_dedup_losers, a
    # two-level bucket groupby), then the loser-id set anti-filters the
    # payload MAP-SIDE via the bloom prescreen — bloom-negative rows
    # (~the whole corpus at real dup rates) never shuffle; the FP
    # minority is exactly verified with a slim-keyed join.
    losers = exact_dedup_losers(gated, "doc_id", "text")
    exact_docs = bloom_semi_anti(
        gated, "doc_id", losers, "doc_id", keep_in=False
    ).materialize()  # consumed twice: pair mining + the anti-join left side

    pairs = minhash_lsh_pairs(
        exact_docs, "doc_id", "text", threshold=0.9, num_perm=64, bands=16, k=3,
        verify="exact", payload_mode="auto",
    )
    # near-dup removal: drop every id_b, again as a map-side bloom anti.
    # No distinct pass on the drop ids: duplicate bloom/verify keys can
    # only duplicate HIT rows, and anti drops hits — output identical.
    drops = pairs.map_batches(
        lambda t: pa.table({"doc_id": pc.cast(t["id_b"], pa.int64())}),
        batch_format="pyarrow",
    )
    survivors = bloom_semi_anti(exact_docs, "doc_id", drops, "doc_id", keep_in=False)

    out = pack_sequences(survivors, "doc_id", "text", seq_len=128)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "n_tokens", "tok_start", "seq_first", "seq_last"):
        df[c] = df[c].astype("int64")
    return df


def _training_pipeline_sql() -> str:
    R = _GOPHER_RULES
    stop_list = ", ".join(f"'{s}'" for s in _GOPHER_STOPWORDS)
    return f"""
WITH w0 AS (
  SELECT doc_id, text, regexp_extract_all(lower(text), '\\w+') AS w FROM documents
),
g AS (
  SELECT doc_id, text, w, len(w) AS n_tok,
         CASE WHEN len(w) = 0 THEN 0.0
              ELSE length(array_to_string(w, '')) * 1.0 / len(w) END AS mwl,
         len(list_filter(w, x -> x IN ({stop_list}))) AS n_stop,
         [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))] AS g2,
         [w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)] AS g3
  FROM w0
),
t2 AS (
  SELECT doc_id, MAX(c) AS maxc FROM (
    SELECT doc_id, gram, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(g2) AS gram FROM g) GROUP BY doc_id, gram
  ) GROUP BY doc_id
),
t3 AS (
  SELECT doc_id, 1.0 - COUNT(DISTINCT gram) * 1.0 / COUNT(*) AS dup3
  FROM (SELECT doc_id, unnest(g3) AS gram FROM g) GROUP BY doc_id
),
gated AS (
  SELECT g.doc_id, g.text, g.w FROM g
  LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
  WHERE g.n_tok BETWEEN {R["min_tok"]} AND {R["max_tok"]}
    AND g.mwl >= {R["min_wl"]} AND g.mwl <= {R["max_wl"]}
    AND NOT ((CASE WHEN g.n_tok >= 2 THEN 2.0 * t2.maxc / g.n_tok ELSE 0.0 END) > {R["max_rep"]}
             OR COALESCE(t3.dup3, 0.0) > {R["max_rep"]})
    AND g.n_stop >= {R["min_stop"]}
),
exact AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, w, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM gated
  ) WHERE rn = 1
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w)-1)])
              ELSE [array_to_string(w, ' ')] END AS s
  FROM exact WHERE len(w) >= 1
),
drops AS (
  SELECT DISTINCT b.doc_id FROM sh a JOIN sh b ON b.doc_id > a.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / len(list_distinct(a.s || b.s)) >= 0.9
),
keep AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM exact
  WHERE doc_id NOT IN (SELECT doc_id FROM drops)
),
s AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
             ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
  FROM keep WHERE n_tokens > 0
)
SELECT doc_id, n_tokens, tok_start,
       tok_start // 128                    AS seq_first,
       (tok_start + n_tokens - 1) // 128   AS seq_last
FROM s ORDER BY doc_id
"""


def hits_corpus(sf_dir: str) -> pd.DataFrame:
    """HITS hubs & authorities over the tiny-corpus link graph
    (stages/pagerank.hits): the second classic link-analysis ranking
    (Kleinberg 1999) next to PageRank — hub-ness finds link directories,
    authority-ness finds link targets.  Two L2-normalized power
    iterations, oracle-reproduced as unrolled CTEs."""
    from ..functions.extract import extract_links
    from ..sources.corpus import ensure
    from ..stages.pagerank import hits

    corpus = ensure("tiny")
    pages = rd.read_parquet(f"{corpus}/pages", columns=["url", "html"])

    out = hits(pages.map_batches(_link_edges, batch_format="pyarrow"), iters=2).to_pandas()
    out = out.rename(columns={"node": "url"})
    out["hub"] = out["hub"].round(6)
    out["authority"] = out["authority"].round(6)
    return out.sort_values("url").reset_index(drop=True)


def _hits_sql(iters: int = 2) -> str:
    parts = [
        rf"""
WITH pages AS (
  SELECT url, decode(html) AS html,
         regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host
  FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet')
), links AS (
  SELECT DISTINCT p.url AS src,
         CASE WHEN href LIKE 'http%' THEN href
              WHEN href = '/' THEN 'https://' || p.host
              ELSE 'https://' || p.host || href END AS dst
  FROM pages p, UNNEST(regexp_extract_all(p.html,
       '<a\s[^>]*?href\s*=\s*["'']([^"''<>]+)["'']', 1)) AS u(href)
), nodes AS (
  SELECT src AS node FROM links UNION SELECT dst FROM links
), h0 AS (SELECT node, 1.0 AS v FROM nodes)"""
    ]
    prev_h = "h0"
    for k in range(1, iters + 1):
        parts.append(
            f""",
a{k}r AS (
  SELECT l.dst AS node, SUM(p.v) AS v FROM links l JOIN {prev_h} p ON p.node = l.src GROUP BY l.dst
),
a{k} AS (
  SELECT n.node, COALESCE(r.v, 0) / sqrt((SELECT SUM(v*v) FROM a{k}r)) AS v
  FROM nodes n LEFT JOIN a{k}r r USING (node)
),
h{k}r AS (
  SELECT l.src AS node, SUM(a.v) AS v FROM links l JOIN a{k} a ON a.node = l.dst GROUP BY l.src
),
h{k} AS (
  SELECT n.node, COALESCE(r.v, 0) / sqrt((SELECT SUM(v*v) FROM h{k}r)) AS v
  FROM nodes n LEFT JOIN h{k}r r USING (node)
)"""
        )
        prev_h = f"h{k}"
    parts.append(
        f"""
SELECT h{iters}.node AS url, ROUND(h{iters}.v, 6) AS hub, ROUND(a{iters}.v, 6) AS authority
FROM h{iters} JOIN a{iters} ON a{iters}.node = h{iters}.node ORDER BY url"""
    )
    return "".join(parts)


def boilerplate_removed_docs(sf_dir: str) -> pd.DataFrame:
    """Cross-document boilerplate line removal (stages/c4filter
    .boilerplate_line_dedup — the C4/WET rule: a line verbatim in >5
    docs is template chrome).  Deterministic template injection gives
    the rule real work: every doc gains a per-source footer line (each
    source has ~25 docs, so every footer crosses the threshold and is
    stripped; each doc's own unique text line survives).  One slim
    line-md5 groupby + a broadcast strip pass."""
    from ..stages.c4filter import boilerplate_line_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def inject(batch: pa.Table) -> pa.Table:
        texts = [
            f"{t}\nsubscribe to the {s} newsletter for updates"
            for t, s in zip(batch["text"].to_pylist(), batch["source"].to_pylist())
        ]
        return pa.table({"doc_id": batch["doc_id"], "text": pa.array(texts, pa.string())})

    out = boilerplate_line_dedup(
        ds.map_batches(inject, batch_format="pyarrow"), "doc_id", "text", min_docs=5
    ).to_pandas()
    for c in ("doc_id", "n_lines", "n_boiler_removed"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


_BOILERPLATE_SQL = r"""
WITH aug AS (
  SELECT doc_id,
         text || chr(10) || 'subscribe to the ' || source || ' newsletter for updates' AS t2
  FROM documents
),
l AS (
  SELECT doc_id, unnest(list_distinct(list_filter(string_split(t2, chr(10)),
                 x -> regexp_matches(x, '\S')))) AS line
  FROM aug
),
cnt AS (SELECT line, COUNT(*) AS df FROM l GROUP BY line),
boiler AS (SELECT COALESCE(list(line), []) AS bl FROM cnt WHERE df > 5),
nb AS (
  SELECT a.doc_id,
         list_filter(string_split(a.t2, chr(10)), x -> regexp_matches(x, '\S')) AS nbl
  FROM aug a
),
kept AS (
  SELECT n.doc_id, n.nbl,
         list_filter(n.nbl, x -> NOT list_contains(b.bl, x)) AS kl
  FROM nb n CROSS JOIN boiler b
)
SELECT doc_id,
       CAST(len(nbl) AS BIGINT) AS n_lines,
       CAST(len(nbl) - len(kl) AS BIGINT) AS n_boiler_removed,
       md5(COALESCE(list_aggregate(kl, 'string_agg', chr(10)), '')) AS clean_md5
FROM kept ORDER BY doc_id
"""


def _make_paras_batch(batch: pa.Table) -> pa.Table:
    """Shared paragraph synthesis for the paragraph-dedup family: 8-word
    paragraphs + two SQL-reproducibly planted boilerplate paragraphs
    (doc_id%3: share-footer; doc_id%5: per-lang rights line).  Keeps
    (doc_id, text, lang)."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    out = []
    for i, t, lg in zip(ids, batch["text"].to_pylist(), batch["lang"].to_pylist()):
        w = (t or "").split(" ")
        paras = [" ".join(w[j : j + 8]) for j in range(0, len(w), 8)]
        t2 = "\n".join(paras)
        i = int(i)
        if i % 3 == 0:
            t2 += "\nshare this article on social media"
        if i % 5 == 0:
            t2 += f"\nall rights reserved by {lg}"
        out.append(t2)
    return pa.table(
        {
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "text": pa.array(out, pa.string()),
            "lang": batch["lang"],
        }
    )


def para_deduped_docs(sf_dir: str) -> pd.DataFrame:
    """Paragraph-level exact dedup (stages/paradedup.paragraph_dedup):
    every repeated non-empty paragraph keeps only its first
    (doc, position) occurrence corpus-wide — the Dolma-granularity
    dedup between whole-document dedup and span removal.  Documents are
    re-shaped into 8-word paragraphs and two boilerplate paragraphs are
    planted SQL-reproducibly (doc_id%3: a share-footer; doc_id%5: a
    per-lang rights line) so the first-wins semantics has real cross-doc
    work.  Text never enters the dedup shuffle — only
    (md5(para), packed(doc,idx)) rows move; clean text is hash-checked
    via md5."""
    import hashlib as _hl

    from ..stages.paradedup import paragraph_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    clean = paragraph_dedup(
        ds.map_batches(_make_paras_batch, batch_format="pyarrow").drop_columns(
            ["lang"]
        )
    )

    def digest(t: pa.Table) -> pa.Table:
        md5s = [
            _hl.md5((x or "").encode("utf-8")).hexdigest()
            for x in t["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "clean_md5": pa.array(md5s, pa.string()),
                "n_paras": t["n_paras"],
                "n_dropped": t["n_dropped"],
            }
        )

    out = clean.map_batches(digest, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_PARA_DEDUP_SQL = r"""
WITH aug AS (
  SELECT doc_id,
         list_aggregate(
           list_transform(range(0, CAST(ceil(len(w) / 8.0) AS BIGINT)),
                          i -> array_to_string(w[i*8+1 : i*8+8], ' ')),
           'string_agg', chr(10))
         || CASE WHEN doc_id % 3 = 0
                 THEN chr(10) || 'share this article on social media' ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN chr(10) || 'all rights reserved by ' || lang ELSE '' END AS t
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
),
segs AS (SELECT doc_id, string_split(t, chr(10)) AS ps FROM aug),
p AS (
  SELECT s.doc_id, CAST(z[2] AS BIGINT) AS idx, z[1] AS para
  FROM segs s, UNNEST(list_zip(s.ps, range(1, len(s.ps) + 1))) AS u(z)
),
keep AS (
  SELECT doc_id, idx FROM (
    SELECT doc_id, idx,
           ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, idx) AS rn
    FROM p WHERE para <> ''
  ) WHERE rn = 1
),
j AS (
  SELECT p.doc_id, p.idx, p.para,
         CASE WHEN p.para = '' OR k.idx IS NOT NULL THEN 1 ELSE 0 END AS kept
  FROM p LEFT JOIN keep k ON k.doc_id = p.doc_id AND k.idx = p.idx
)
SELECT doc_id,
       md5(COALESCE(string_agg(para, chr(10) ORDER BY idx)
                    FILTER (WHERE kept = 1), '')) AS clean_md5,
       CAST(COUNT(*) FILTER (WHERE para <> '') AS BIGINT) AS n_paras,
       CAST(COUNT(*) FILTER (WHERE para <> '' AND kept = 0) AS BIGINT) AS n_dropped
FROM j GROUP BY doc_id ORDER BY doc_id
"""


def fineweb_pipeline(sf_dir: str) -> pd.DataFrame:
    """Composed FineWeb-style cleaning pipeline — the second-pass
    operators chained end-to-end under ONE SQL oracle:

      paragraph re-shape + planted boilerplate
        → paragraph_dedup (first-occurrence-wins, cross-doc)
        → per-lang MEDIAN discrete-quantile quality gate on the CLEANED
          text (mean-token-length score, thresholds broadcast once)
        → exact dedup of the cleaned text (min doc_id per md5 — a
          bucketed keep-set semi-join, text never re-shuffles)
        → length-weighted sequential-Poisson top-200 draw (the
          token-budget selection).

    Every stage's arithmetic is the already-hash-green primitive, so
    the composition check is about stage INTERACTION (column
    propagation through paragraph_dedup, gating on rebuilt text,
    dedup-after-gate ordering), not new kernels."""
    from ..stages.dedup import exact_dedup_stats
    from ..stages.paradedup import paragraph_dedup
    from ..stages.sample import weighted_sample_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    # no materialize: `clean` has ONE consumer (the score map); the
    # two-consumer fan-out point is `scored` below
    clean = paragraph_dedup(ds.map_batches(_make_paras_batch, batch_format="pyarrow"))

    def score(batch: pa.Table) -> pa.Table:
        chars = pc.cast(pc.utf8_length(batch["text"]), pa.float64())
        spaces = pc.cast(pc.count_substring(batch["text"], " "), pa.float64())
        mtl = pc.divide(pc.subtract(chars, spaces), pc.add(spaces, 1.0))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "text": batch["text"],
                "mtl": mtl,
            }
        )

    scored = clean.map_batches(score, batch_format="pyarrow").materialize()

    def p50(g: pd.DataFrame) -> pd.DataFrame:
        v = g["mtl"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]],
                "thr": [float(np.quantile(v, 0.5, method="inverted_cdf"))],
            }
        )

    thr_rows = scored.groupby("lang").map_groups(p50, batch_format="pandas").take_all()
    thr_ref = ray.put(
        (
            pa.array([r["lang"] for r in thr_rows], pa.string()),
            np.array([r["thr"] for r in thr_rows], dtype=np.float64),
        )
    )

    def gate(batch: pa.Table) -> pa.Table:
        keys, vals = ray.get(thr_ref)  # index_in + take: the J2 pattern
        mtl = batch["mtl"].to_numpy(zero_copy_only=False)
        pos = pc.index_in(batch["lang"].combine_chunks(), value_set=keys).to_numpy(
            zero_copy_only=False
        )
        tv = vals[pos.astype(np.int64)]
        return batch.filter(pa.array(mtl >= tv)).drop_columns(["mtl"])

    gated = scored.map_batches(gate, batch_format="pyarrow").materialize()

    # exact dedup of cleaned text: keep-set as a Dataset, applied by a
    # bucketed semi-join (clean_corpus_stats discipline)
    keep_ds = exact_dedup_stats(gated, "doc_id", "text").map_batches(
        lambda t: pa.table({"keep_doc_id": t["keep_doc_id"]}), batch_format="pyarrow"
    )
    kept = hash_join(gated, keep_ds, on="doc_id", right_on="keep_doc_id", num_buckets=16)

    def weigh(batch: pa.Table) -> pa.Table:
        import hashlib as _hl

        n = pc.cast(pc.max_element_wise(pc.utf8_length(batch["text"]), 1), pa.int64())
        md5s = [
            _hl.md5((x or "").encode("utf-8")).hexdigest()
            for x in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "n_chars": n,
                "clean_md5": pa.array(md5s, pa.string()),
            }
        )

    sampled = weighted_sample_topk(
        kept.map_batches(weigh, batch_format="pyarrow"),
        "doc_id", "n_chars", k=200,
        keep_cols=["doc_id", "lang", "n_chars", "clean_md5"],
    ).to_pandas()
    return sampled.sort_values(["sample_key", "doc_id"]).reset_index(drop=True)


_FINEWEB_SQL = r"""
WITH aug AS (
  SELECT doc_id, lang,
         list_aggregate(
           list_transform(range(0, CAST(ceil(len(w) / 8.0) AS BIGINT)),
                          i -> array_to_string(w[i*8+1 : i*8+8], ' ')),
           'string_agg', chr(10))
         || CASE WHEN doc_id % 3 = 0
                 THEN chr(10) || 'share this article on social media' ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN chr(10) || 'all rights reserved by ' || lang ELSE '' END AS t
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
),
segs AS (SELECT doc_id, string_split(t, chr(10)) AS ps FROM aug),
p AS (
  SELECT s.doc_id, CAST(z[2] AS BIGINT) AS idx, z[1] AS para
  FROM segs s, UNNEST(list_zip(s.ps, range(1, len(s.ps) + 1))) AS u(z)
),
keep AS (
  SELECT doc_id, idx FROM (
    SELECT doc_id, idx,
           ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, idx) AS rn
    FROM p WHERE para <> ''
  ) WHERE rn = 1
),
j AS (
  SELECT p.doc_id, p.idx, p.para,
         CASE WHEN p.para = '' OR k.idx IS NOT NULL THEN 1 ELSE 0 END AS kept
  FROM p LEFT JOIN keep k ON k.doc_id = p.doc_id AND k.idx = p.idx
),
cleaned AS (
  SELECT j.doc_id,
         md5(COALESCE(string_agg(para, chr(10) ORDER BY idx)
                      FILTER (WHERE kept = 1), '')) AS clean_md5,
         COALESCE(string_agg(para, chr(10) ORDER BY idx)
                  FILTER (WHERE kept = 1), '') AS ct
  FROM j GROUP BY j.doc_id
),
s AS (
  SELECT c.doc_id, d.lang, c.ct, c.clean_md5,
         (length(c.ct) - (length(c.ct) - length(replace(c.ct, ' ', ''))))
           / ((length(c.ct) - length(replace(c.ct, ' ', ''))) + 1.0) AS mtl
  FROM cleaned c JOIN documents d USING (doc_id)
),
thr AS (SELECT lang, quantile_disc(mtl, 0.5) AS thr FROM s GROUP BY lang),
gated AS (SELECT s.* FROM s JOIN thr t USING (lang) WHERE s.mtl >= t.thr),
dedup AS (
  SELECT * FROM (
    SELECT g.*, ROW_NUMBER() OVER (PARTITION BY md5(ct) ORDER BY doc_id) AS rn
    FROM gated g
  ) WHERE rn = 1
),
keyed AS (
  SELECT doc_id, lang,
         CAST(GREATEST(length(ct), 1) AS BIGINT) AS n_chars, clean_md5,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT)
           / CAST(GREATEST(length(ct), 1) AS DOUBLE) AS sample_key
  FROM dedup
)
SELECT doc_id, lang, n_chars, clean_md5, sample_key
FROM keyed ORDER BY sample_key, doc_id LIMIT 200
"""


def langid_model_scores(sf_dir: str) -> pd.DataFrame:
    """Trained language-ID model (stages/langid_model): naive-Bayes
    char-trigram classifier trained DISTRIBUTED on the doc_id%4==0
    slice (two bucketed sums over slim (lang, trigram, count) partials),
    persisted to an npz model file, then scored on the doc_id%7==3
    slice by an actor pool that loads the FILE once per actor — the
    train→persist→load→batch-score lifecycle of a real fastText-style
    deployment, with the entire computation (training counts, top-512
    vocabulary, add-one smoothing, per-occurrence OOV terms, 6dp
    argmax) reproduced by the SQL oracle."""
    import hashlib as _hl
    import os as _os

    from ..stages.langid_model import save_langid_model, score_langid, train_langid_model

    doc_path = _p(sf_dir, "documents")
    st = _os.stat(doc_path)
    key = f"langid|{sf_dir}|{st.st_mtime_ns}|{st.st_size}|v512"
    model_path = f"/tmp/dc4r_langid/{_hl.md5(key.encode()).hexdigest()[:12]}.npz"
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    if not _os.path.exists(model_path):
        _os.makedirs(_os.path.dirname(model_path), exist_ok=True)
        train = ds.map_batches(
            lambda t: t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 3), 0)),
            batch_format="pyarrow",
        )
        model = train_langid_model(train, vocab_size=512)
        save_langid_model(model_path, model)

    def eval_slice(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = (ids % 7 == 3) & (
            pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False) >= 3
        )
        return t.filter(pa.array(keep))

    evald = ds.map_batches(eval_slice, batch_format="pyarrow")
    out = score_langid(evald, model_path).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_LANGID_SQL = r"""
WITH train AS (
  SELECT lang, lower(text) AS t FROM documents WHERE doc_id % 4 = 0
),
tri AS (
  SELECT lang, unnest([substr(t, i, 3) for i in range(1, length(t) - 1)]) AS g
  FROM train WHERE length(t) >= 3
),
cnt AS (SELECT lang, g, COUNT(*) * 1.0 AS c FROM tri GROUP BY lang, g),
tot AS (SELECT g, SUM(c) AS total FROM cnt GROUP BY g),
vocab AS (SELECT g FROM tot ORDER BY total DESC, g LIMIT 512),
nl AS (SELECT c.lang, SUM(c.c) AS n FROM cnt c JOIN vocab v USING (g) GROUP BY c.lang),
vs AS (SELECT COUNT(*) * 1.0 AS v FROM vocab),  -- actual |vocab| (may be < the LIMIT)
langs AS (SELECT DISTINCT lang FROM train),
logp AS (
  SELECT l.lang, v.g, ln((COALESCE(c.c, 0) + 1.0) / (n.n + (SELECT v FROM vs))) AS lp
  FROM langs l CROSS JOIN vocab v
  LEFT JOIN cnt c ON c.lang = l.lang AND c.g = v.g
  JOIN nl n ON n.lang = l.lang
),
oov AS (SELECT lang, ln(1.0 / (n + (SELECT v FROM vs))) AS lp FROM nl),
ev AS (
  SELECT doc_id, lower(text) AS t FROM documents
  WHERE doc_id % 7 = 3 AND length(text) >= 3
),
etri AS (
  SELECT doc_id, unnest([substr(t, i, 3) for i in range(1, length(t) - 1)]) AS g
  FROM ev
),
escore AS (
  SELECT e.doc_id, l.lang, ROUND(SUM(COALESCE(p.lp, o.lp)), 6) AS s
  FROM etri e
  CROSS JOIN langs l
  LEFT JOIN logp p ON p.lang = l.lang AND p.g = e.g
  JOIN oov o ON o.lang = l.lang
  GROUP BY e.doc_id, l.lang
),
pred AS (
  SELECT doc_id, lang AS pred_lang FROM (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, lang) AS rn
    FROM escore
  ) WHERE rn = 1
)
SELECT e.doc_id,
       MAX(CASE WHEN lang = 'de' THEN s END) AS score_de,
       MAX(CASE WHEN lang = 'en' THEN s END) AS score_en,
       MAX(CASE WHEN lang = 'es' THEN s END) AS score_es,
       MAX(CASE WHEN lang = 'fr' THEN s END) AS score_fr,
       MAX(CASE WHEN lang = 'zh' THEN s END) AS score_zh,
       MAX(p.pred_lang) AS pred_lang
FROM escore e JOIN pred p USING (doc_id)
GROUP BY e.doc_id ORDER BY e.doc_id
"""


def _ngram_ppl(sf_dir: str, mode: str) -> pd.DataFrame:
    """Shared body of the two ngram_perplexity entries: train the CCNet
    bigram LM on the doc_id%7==0 slice, score EVERY scoreable doc."""
    from ..stages.ngramlm import score_perplexity, train_bigram_lm

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).materialize()

    def is_train(batch: pa.Table) -> pa.Table:
        keep = (batch["doc_id"].to_numpy(zero_copy_only=False) % 7) == 0
        return batch.filter(pa.array(keep))

    uni, bg, vocab = train_bigram_lm(ds.map_batches(is_train, batch_format="pyarrow"))
    scored = score_perplexity(ds, uni, bg, vocab, keep_cols=(), mode=mode)
    out = scored.to_pandas().sort_values("doc_id").reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_bigrams"] = out["n_bigrams"].astype("int64")
    return out[["doc_id", "n_bigrams", "ppl"]]


def ngram_perplexity(sf_dir: str) -> pd.DataFrame:
    """CCNet-style LM cleaning signal (stages/ngramlm.py): bigram LM
    trained on a clean slice, per-doc perplexity over the corpus —
    broadcast-model path (zero shuffles)."""
    return _ngram_ppl(sf_dir, "broadcast")


def ngram_perplexity_join(sf_dir: str) -> pd.DataFrame:
    """Same LM + scores via the JOIN path (count tables too big for the
    object store at 100 TB): slim gram explode, two bucketed hash joins,
    one bucketed per-doc reduce.  Same oracle as the broadcast twin."""
    return _ngram_ppl(sf_dir, "join")


_NGRAM_PPL_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS t FROM documents
),
tr AS (SELECT t FROM toks WHERE doc_id % 7 = 0),
uni_cnt AS (
  SELECT tok, CAST(COUNT(*) AS DOUBLE) AS c1
  FROM (SELECT unnest(t) AS tok FROM tr) GROUP BY tok
),
bg_cnt AS (
  SELECT gram, CAST(COUNT(*) AS DOUBLE) AS c2 FROM (
    SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS gram
    FROM tr WHERE len(t) >= 2
  ) GROUP BY gram
),
v AS (SELECT CAST(COUNT(*) + 1 AS DOUBLE) AS vocab FROM uni_cnt),
doc_bg AS (
  SELECT doc_id,
         unnest(t[1:len(t) - 1]) AS w1,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS gram
  FROM toks WHERE len(t) >= 2
),
lp AS (
  SELECT d.doc_id,
         ln((COALESCE(b.c2, 0) + 0.5) / (COALESCE(u.c1, 0) + 0.5 * v.vocab)) AS lp
  FROM doc_bg d
  LEFT JOIN bg_cnt b ON b.gram = d.gram
  LEFT JOIN uni_cnt u ON u.tok = d.w1
  CROSS JOIN v
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(exp(-SUM(lp) / COUNT(*)), 4) AS ppl
FROM lp GROUP BY doc_id ORDER BY doc_id
"""


def dsir_selected_docs(sf_dir: str) -> pd.DataFrame:
    """DSIR data selection (stages/dsir.py): hashed-bigram importance
    weights of the raw pool (doc_id%7!=0) against the clean target slice
    (doc_id%7==0), Gumbel-top-50 resample.  Two map-side passes, zero
    shuffles; only B-bucket count vectors and blocks*k top-k partials
    reach the driver."""
    from ..stages.dsir import dsir_lambda, dsir_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).materialize()
    lam = dsir_lambda(ds, "doc_id % 7 == 0")
    return dsir_topk(ds, lam, "doc_id % 7 != 0", k=50)


_DSIR_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS t FROM documents
),
grams AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS g
  FROM toks WHERE len(t) >= 2
),
feats AS (SELECT doc_id, CAST(md5_number_lower(g) % 4096 AS BIGINT) AS f FROM grams),
tgt AS (SELECT f, CAST(COUNT(*) AS DOUBLE) AS c FROM feats WHERE doc_id % 7 = 0 GROUP BY f),
rawc AS (SELECT f, CAST(COUNT(*) AS DOUBLE) AS c FROM feats WHERE doc_id % 7 <> 0 GROUP BY f),
tot AS (
  SELECT (SELECT COALESCE(SUM(c), 0) FROM tgt) AS tt,
         (SELECT COALESCE(SUM(c), 0) FROM rawc) AS rr
),
lam AS (
  SELECT r.f,
         ln(((COALESCE(t.c, 0) + 0.5) / (tot.tt + 0.5 * 4096))
            / ((r.c + 0.5) / (tot.rr + 0.5 * 4096))) AS lam
  FROM rawc r LEFT JOIN tgt t ON t.f = r.f CROSS JOIN tot
),
scored AS (
  SELECT d.doc_id, SUM(l.lam) AS w
  FROM feats d JOIN lam l ON l.f = d.f
  WHERE d.doc_id % 7 <> 0 GROUP BY d.doc_id
),
keyed AS (
  SELECT doc_id, w,
         w + (-ln(-ln((CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 4294967296 AS DOUBLE) + 0.5)
                      / 4294967296.0))) AS skey
  FROM scored
)
SELECT doc_id, ROUND(w, 4) AS weight, ROUND(skey, 4) AS skey
FROM (SELECT * FROM keyed ORDER BY skey DESC, doc_id LIMIT 50)
"""


def ccnet_ppl_buckets(sf_dir: str) -> pd.DataFrame:
    """CCNet's head/middle/tail corpus split (Wenzek et al. 2020): per-
    language perplexity ranking under the clean-slice bigram LM, cut into
    three equal-count bands.  LM scoring is the broadcast map-side pass;
    the ranking is the two-phase prefix-sum rank of
    stages/ngramlm.ppl_rank_buckets — only (doc_id, lang, ppl) shuffles."""
    from ..stages.ngramlm import ppl_rank_buckets, score_perplexity, train_bigram_lm

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"]).materialize()

    def is_train(batch: pa.Table) -> pa.Table:
        keep = (batch["doc_id"].to_numpy(zero_copy_only=False) % 7) == 0
        return batch.filter(pa.array(keep))

    uni, bg, vocab = train_bigram_lm(ds.map_batches(is_train, batch_format="pyarrow"))
    scored = score_perplexity(ds, uni, bg, vocab, keep_cols=("lang",), mode="broadcast")
    out = ppl_rank_buckets(scored).to_pandas().sort_values("doc_id").reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype("int64")
    return out[["doc_id", "lang", "ppl", "bucket"]]


_CCNET_BUCKET_SQL = r"""
WITH toks AS (
  SELECT doc_id, lang, regexp_extract_all(lower(text), '\w+') AS t FROM documents
),
tr AS (SELECT t FROM toks WHERE doc_id % 7 = 0),
uni_cnt AS (
  SELECT tok, CAST(COUNT(*) AS DOUBLE) AS c1
  FROM (SELECT unnest(t) AS tok FROM tr) GROUP BY tok
),
bg_cnt AS (
  SELECT gram, CAST(COUNT(*) AS DOUBLE) AS c2 FROM (
    SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS gram
    FROM tr WHERE len(t) >= 2
  ) GROUP BY gram
),
v AS (SELECT CAST(COUNT(*) + 1 AS DOUBLE) AS vocab FROM uni_cnt),
doc_bg AS (
  SELECT doc_id, lang,
         unnest(t[1:len(t) - 1]) AS w1,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS gram
  FROM toks WHERE len(t) >= 2
),
lp AS (
  SELECT d.doc_id, d.lang,
         ln((COALESCE(b.c2, 0) + 0.5) / (COALESCE(u.c1, 0) + 0.5 * v.vocab)) AS lp
  FROM doc_bg d
  LEFT JOIN bg_cnt b ON b.gram = d.gram
  LEFT JOIN uni_cnt u ON u.tok = d.w1
  CROSS JOIN v
),
ppl AS (
  SELECT doc_id, lang, ROUND(exp(-SUM(lp) / COUNT(*)), 4) AS ppl
  FROM lp GROUP BY doc_id, lang
),
ranked AS (
  SELECT doc_id, lang, ppl,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY ppl, doc_id) AS r,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM ppl
)
SELECT doc_id, lang, ppl,
       CASE WHEN r * 3 <= n THEN 'head'
            WHEN r * 3 <= 2 * n THEN 'middle'
            ELSE 'tail' END AS bucket
FROM ranked ORDER BY doc_id
"""


#: UT1-style blocklist for blocklist_filtered_docs — declared once,
#: identically in the SQL twin.  site99 matches nothing (the miss path);
#: site3 blocks a whole domain incl. subdomains; the ads./media. entries
#: block only specific subdomain subtrees.
_BLOCKLIST = ("site3.example", "ads.site5.example", "media.site9.example", "site99.example")


def blocklist_filtered_docs(sf_dir: str) -> pd.DataFrame:
    """Domain-blocklist pass (stages/blocklist.py): deterministic host
    per doc (multi-label, like the PII-injection convention), broadcast
    UT1-style list, vectorized label-suffix match — one map-side pass,
    zero shuffles.  blocked_by = smallest matching entry, '' = kept."""
    from ..stages.blocklist import domain_block_flags

    ds = _read(sf_dir, "documents", columns=["doc_id"]).materialize()

    def mk_host(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sub = np.array(["ads.", "cdn.media.", "www.", ""], dtype=object)[ids % 4]
        base = np.array([f"site{i}.example" for i in range(17)], dtype=object)[ids % 17]
        return pa.table(
            {"doc_id": batch["doc_id"], "host": pa.array(sub + base, pa.string())}
        )

    out = domain_block_flags(
        ds.map_batches(mk_host, batch_format="pyarrow"), "host", _BLOCKLIST
    )
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df["doc_id"] = df["doc_id"].astype("int64")
    return df[["doc_id", "host", "blocked_by"]]


_BLOCKLIST_SQL = r"""
WITH hosts AS (
  SELECT doc_id,
         (CASE doc_id % 4 WHEN 0 THEN 'ads.' WHEN 1 THEN 'cdn.media.'
               WHEN 2 THEN 'www.' ELSE '' END)
         || 'site' || CAST(doc_id % 17 AS VARCHAR) || '.example' AS host
  FROM documents
),
blocked(dom) AS (VALUES ('site3.example'), ('ads.site5.example'),
                        ('media.site9.example'), ('site99.example'))
SELECT h.doc_id, h.host, COALESCE(MIN(b.dom), '') AS blocked_by
FROM hosts h LEFT JOIN blocked b
  ON h.host = b.dom OR ends_with(h.host, '.' || b.dom)
GROUP BY h.doc_id, h.host ORDER BY h.doc_id
"""


def ccnet_pipeline(sf_dir: str) -> pd.DataFrame:
    """COMPOSED CCNet-style cleaning (Wenzek et al. 2020 Fig. 1): bigram
    LM trained on the clean slice → per-lang head/middle/tail ppl split
    → drop the tail third → exact first-wins content dedup → per-(lang,
    bucket) rollup.  Both removals are MAP-SIDE bloom anti-filters (the
    flagship training_data_pipeline shape): text payloads never cross an
    all-to-all — only slim id sets and the (doc_id, lang, ppl) table
    shuffle."""
    from ..stages.agg import partial_grouped_sum
    from ..stages.dedup import exact_dedup_losers
    from ..stages.join import bloom_semi_anti
    from ..stages.ngramlm import ppl_rank_buckets, score_perplexity, train_bigram_lm

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"]).materialize()

    def is_train(batch: pa.Table) -> pa.Table:
        keep = (batch["doc_id"].to_numpy(zero_copy_only=False) % 7) == 0
        return batch.filter(pa.array(keep))

    uni, bg, vocab = train_bigram_lm(ds.map_batches(is_train, batch_format="pyarrow"))
    scored = score_perplexity(ds, uni, bg, vocab, keep_cols=("lang",), mode="broadcast")
    buckets = ppl_rank_buckets(scored).materialize()

    kept_buckets = buckets.filter(expr="bucket != 'tail'").materialize()
    kept_docs = bloom_semi_anti(
        ds, "doc_id", kept_buckets.select_columns(["doc_id"]), "doc_id", keep_in=True
    )
    losers = exact_dedup_losers(kept_docs, "doc_id", "text")
    surv_buckets = bloom_semi_anti(kept_buckets, "doc_id", losers, "doc_id", keep_in=False)
    roll = partial_grouped_sum(
        surv_buckets, ["lang", "bucket"], sums=["ppl"], count_alias="n_docs"
    ).to_pandas()
    roll["avg_ppl"] = (roll["sum_ppl"] / roll["n_docs"]).round(4)
    roll["n_docs"] = roll["n_docs"].astype("int64")
    return (
        roll[["lang", "bucket", "n_docs", "avg_ppl"]]
        .sort_values(["lang", "bucket"])
        .reset_index(drop=True)
    )


_CCNET_PIPELINE_SQL = r"""
WITH toks AS (
  SELECT doc_id, lang, regexp_extract_all(lower(text), '\w+') AS t FROM documents
),
tr AS (SELECT t FROM toks WHERE doc_id % 7 = 0),
uni_cnt AS (
  SELECT tok, CAST(COUNT(*) AS DOUBLE) AS c1
  FROM (SELECT unnest(t) AS tok FROM tr) GROUP BY tok
),
bg_cnt AS (
  SELECT gram, CAST(COUNT(*) AS DOUBLE) AS c2 FROM (
    SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS gram
    FROM tr WHERE len(t) >= 2
  ) GROUP BY gram
),
v AS (SELECT CAST(COUNT(*) + 1 AS DOUBLE) AS vocab FROM uni_cnt),
doc_bg AS (
  SELECT doc_id, lang,
         unnest(t[1:len(t) - 1]) AS w1,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS gram
  FROM toks WHERE len(t) >= 2
),
lp AS (
  SELECT d.doc_id, d.lang,
         ln((COALESCE(b.c2, 0) + 0.5) / (COALESCE(u.c1, 0) + 0.5 * v.vocab)) AS lp
  FROM doc_bg d
  LEFT JOIN bg_cnt b ON b.gram = d.gram
  LEFT JOIN uni_cnt u ON u.tok = d.w1
  CROSS JOIN v
),
ppl AS (
  SELECT doc_id, lang, ROUND(exp(-SUM(lp) / COUNT(*)), 4) AS ppl
  FROM lp GROUP BY doc_id, lang
),
ranked AS (
  SELECT doc_id, lang, ppl,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY ppl, doc_id) AS r,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM ppl
),
kept AS (
  SELECT doc_id, lang, ppl,
         CASE WHEN r * 3 <= n THEN 'head' ELSE 'middle' END AS bucket
  FROM ranked WHERE r * 3 <= 2 * n
),
dd AS (
  SELECT k.doc_id, k.lang, k.ppl, k.bucket,
         ROW_NUMBER() OVER (PARTITION BY md5(d.text) ORDER BY k.doc_id) AS rn
  FROM kept k JOIN documents d ON d.doc_id = k.doc_id
)
SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(ppl), 4) AS avg_ppl
FROM dd WHERE rn = 1
GROUP BY lang, bucket ORDER BY lang, bucket
"""


def nfc_normalized_docs(sf_dir: str) -> pd.DataFrame:
    """Unicode NFC canonicalization (functions/textnorm.py): deterministic
    denormalized suffixes injected on both sides (the _inject_pii
    convention) — combining acute (doc_id%4==1), compatibility U+212B
    (%4==2), already-composed non-ASCII (%4==3), pure ASCII (%4==0, the
    vectorized fast path).  One map-side pass, zero shuffles."""
    from ..functions.hashing import md5_hex
    from ..functions.textnorm import nfc_normalize_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).materialize()

    def norm(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # explicit escapes: %4==1 DECOMPOSED e+combining-acute, %4==2
        # compatibility angstrom U+212B, %4==3 PRECOMPOSED U+00E9
        suffix = np.array(
            ["", " cafe\u0301", " \u212b", " caf\u00e9"], dtype=object
        )[ids % 4]
        texts = np.asarray(batch["text"].to_pylist(), dtype=object) + suffix
        out, changed = nfc_normalize_batch(pa.array(texts, pa.string()))
        md5s = [md5_hex(s) for s in out.to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "norm_md5": pa.array(md5s, pa.string()),
                "changed": changed,
            }
        )

    df = (
        ds.map_batches(norm, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    df["doc_id"] = df["doc_id"].astype("int64")
    return df[["doc_id", "norm_md5", "changed"]]


_NFC_SQL = r"""
WITH aug AS (
  SELECT doc_id,
         text || CASE doc_id % 4
                 WHEN 1 THEN ' cafe' || chr(769)
                 WHEN 2 THEN ' ' || chr(8491)
                 WHEN 3 THEN ' caf' || chr(233)
                 ELSE '' END AS t
  FROM documents
)
SELECT doc_id, md5(nfc_normalize(t)) AS norm_md5,
       nfc_normalize(t) <> t AS changed
FROM aug ORDER BY doc_id
"""


def bpe_merges(sf_dir: str) -> pd.DataFrame:
    """BPE tokenizer training (stages/bpe.py): word-frequency contraction
    of the clean slice (doc_id%7==0), then 24 distributed merge rounds.
    Rows-only by necessity: the merge loop is iterative (one global
    argmax per round feeding the next round's input) and has no SQL
    form — tests/test_bpe.py pins learn_bpe against the canonical
    single-process Sennrich reference on randomized vocabularies, and
    bpe_encode against rank-order reference encoding."""
    from ..stages.bpe import learn_bpe, word_counts

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).materialize()

    def is_train(batch: pa.Table) -> pa.Table:
        keep = (batch["doc_id"].to_numpy(zero_copy_only=False) % 7) == 0
        return batch.filter(pa.array(keep))

    train = ds.map_batches(is_train, batch_format="pyarrow")
    return learn_bpe(word_counts(train), 24)


def hll_user_registers(sf_dir: str) -> pd.DataFrame:
    """Grouped approximate-distinct SKETCH — per event_type, the nonzero
    HyperLogLog registers (p=12) over user_id (state/hll.py).  The
    sketch a 10^10-URL frontier uses where exact per-host distinct
    counts would shuffle every key: partials merge register-wise, only
    4 KiB per (block, group) crosses the all-to-all.  The oracle pins
    the ENTIRE register state integer-exactly (md5_number_lower hash,
    top-12-bit index, bit_length rank) — not just the estimate, so any
    hash/merge/rank drift fails the gate.  estimate() accuracy vs exact
    COUNT(DISTINCT) is pytest-pinned separately (tests/test_state.py)."""
    from ..state.hll import hll_register_rows

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return hll_register_rows(ds, "event_type", "user_id", p=12)


_HLL_REGISTERS_SQL = """
WITH h AS (
  SELECT DISTINCT event_type,
         md5_number_lower(CAST(user_id AS VARCHAR)) AS h64
  FROM events
), parts AS (
  SELECT event_type,
         CAST(h64 >> 52 AS INTEGER) AS reg,
         h64 % (1::UBIGINT << 52) AS rest
  FROM h
)
SELECT event_type, reg,
       CAST(MAX(CASE WHEN rest = 0 THEN 53
                     ELSE 53 - length(bin(rest)) END) AS INTEGER) AS reg_rank
FROM parts GROUP BY event_type, reg
ORDER BY event_type, reg
"""


def crawl_trap_hosts(sf_dir: str) -> pd.DataFrame:
    """Spider-trap detection over the frontier's URL table
    (stages/traps.py) — the diagnosis behind a per-host page budget
    (the reference caps blindly at MAX_PAGES, server.py:67; a
    10^10-URL frontier must instead find WHICH hosts explode).  Trap
    URL families are planted SQL-reproducibly on the tiny corpus
    (the repo's ghost-row convention): session-id query explosions on
    md5-selected hosts, calendar-style deep paths on md5-selected
    URLs.  Signals are Arrow-RE2 vectorized; the per-host report is
    integer-only so the SQL twin is ulp-proof."""
    from ..functions.hashing import md5_u64
    from ..sources.corpus import ensure
    from ..stages.traps import trap_host_report

    corpus = ensure("tiny")
    base = rd.read_parquet(f"{corpus}/pages", columns=["url"])

    def plant(batch: pa.Table) -> pa.Table:
        col = batch["url"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        rest = pc.replace_substring_regex(col, pattern="^[a-z]+://", replacement="")
        hosts = pc.replace_substring_regex(rest, pattern="/.*$", replacement="").to_pylist()
        urls = col.to_pylist()
        hu = md5_u64(hosts)
        uu = md5_u64(urls)
        out = list(urls)
        # session-id explosion on md5-selected (host, url) pairs
        for u in (np.asarray(urls, dtype=object)[(hu % 7 == 0) & (uu % 3 == 0)]):
            out.extend(f"{u}?sid={k}" for k in range(8))
        # calendar-trap deep paths on md5-selected urls
        for u in (np.asarray(urls, dtype=object)[uu % 53 == 0]):
            out.extend(f"{u}/cal/2024/01/{k}" for k in range(2))
        return pa.table({"url": pa.array(out, pa.string())})

    planted = base.map_batches(plant, batch_format="pyarrow")
    return trap_host_report(planted, min_urls=16, depth_cap=6)


_TRAP_HOSTS_SQL = rf"""
WITH base AS (
  SELECT url FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet')
),
qsel AS (
  SELECT url FROM base
  WHERE md5_number_lower(regexp_extract(url, '^[a-z]+://([^/]+)', 1)) % 7 = 0
    AND md5_number_lower(url) % 3 = 0
),
qvar AS (SELECT url || '?sid=' || k AS url FROM qsel, UNNEST(range(8)) AS t(k)),
dsel AS (SELECT url FROM base WHERE md5_number_lower(url) % 53 = 0),
dvar AS (SELECT url || '/cal/2024/01/' || k AS url FROM dsel, UNNEST(range(2)) AS t(k)),
urls AS (
  SELECT url FROM base
  UNION ALL SELECT url FROM qvar
  UNION ALL SELECT url FROM dvar
),
sig AS (
  SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
         regexp_replace(regexp_replace(url, '^[a-z]+://[^/]+', ''), '\?.*$', '') AS pnq,
         CAST(contains(url, '?') AS INTEGER) AS has_q
  FROM urls
),
sig2 AS (
  SELECT host,
         regexp_replace(pnq, '[0-9]+', 'N', 'g') AS template,
         length(pnq) - length(replace(pnq, '/', '')) AS depth,
         has_q
  FROM sig
),
agg AS (
  SELECT host, COUNT(*) AS n_urls, COUNT(DISTINCT template) AS n_templates,
         SUM(has_q) AS n_query_urls, MAX(depth) AS max_depth
  FROM sig2 GROUP BY host
)
SELECT host, n_urls, n_templates,
       CAST(n_query_urls AS BIGINT) AS n_query_urls,
       CAST(max_depth AS BIGINT) AS max_depth,
       CAST(((2 * n_query_urls >= n_urls AND n_urls >= 16) OR max_depth >= 6)
            AS INTEGER) AS is_trap
FROM agg ORDER BY host
"""


def phrase_search_docs(sf_dir: str) -> pd.DataFrame:
    """Exact phrase retrieval ("table window") from the persisted
    inverted index (stages/textindex.phrase_search_indexed) — the
    AND-prefilter-then-verify plan positional-postings-free engines run:
    bucket-pruned postings reads give the all-terms candidate set, a
    map-side bloom semi-join drops non-candidates in place, and only the
    candidate minority pays the vectorized RE2 adjacency match.  Shares
    the mtime-keyed index cache with bm25_indexed_top10 (same build)."""
    from ..stages.textindex import phrase_search_indexed

    idx_dir = _ensure_text_index(sf_dir)
    corpus = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return phrase_search_indexed(
        idx_dir, "doc_id", ["table", "window"], corpus, extra_cols=["lang"], num_buckets=32
    )


_PHRASE_SEARCH_SQL = r"""
SELECT doc_id, lang FROM documents
WHERE regexp_matches(lower(text),
      '(^|[^\p{L}\p{N}_])table[^\p{L}\p{N}_]+window([^\p{L}\p{N}_]|$)')
ORDER BY doc_id
"""


def cms_user_est(sf_dir: str) -> pd.DataFrame:
    """Count-Min frequency estimates (state/cms.py) — bounded-memory
    per-key occurrence counts where an exact per-key groupby would carry
    O(distinct keys) state (per-host hit counts at 10^10 frontier
    URLs).  Each block folds into a 4x2048 int64 grid shipped as slim
    nonzero (r, b, n) rows; partials SUM-merge; estimate = MIN over the
    4 rows (an overestimate by construction, pinned by property tests).
    The md5 / 11-bit-slice hashing makes grid AND estimates
    integer-exact vs the SQL twin.  Probe set = distinct user_id
    multiples of 7 (deterministic, drawn from the data so every probed
    cell is populated)."""
    from ..state.cms import cms_counters, cms_estimate
    from ..stages.join import bucketed_distinct

    ds = _read(sf_dir, "events", columns=["user_id"])
    counters = cms_counters(ds, "user_id", depth=4, width=2048)

    def sel(batch: pa.Table) -> pa.Table:
        ids = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 7 == 0)).select(["user_id"])

    probes = (
        bucketed_distinct(ds.map_batches(sel, batch_format="pyarrow"), ["user_id"])
        .to_pandas()["user_id"]
        .sort_values()
        .reset_index(drop=True)
    )
    est = cms_estimate(counters, probes.astype(str).tolist(), depth=4, width=2048)
    return pd.DataFrame({"user_id": probes.astype("int64"), "est_count": est.astype("int64")})


_CMS_EST_SQL = """
WITH h AS (
  SELECT md5_number_lower(CAST(user_id AS VARCHAR)) AS h64 FROM events
), rows4 AS (
  SELECT UNNEST(range(4)) AS r
), cells AS (
  SELECT r, CAST((h64 >> (11 * r)) % 2048 AS INTEGER) AS b, COUNT(*) AS n
  FROM h CROSS JOIN rows4
  GROUP BY 1, 2
), probes AS (
  SELECT DISTINCT user_id,
         md5_number_lower(CAST(user_id AS VARCHAR)) AS h64
  FROM events WHERE user_id % 7 = 0
)
SELECT p.user_id, CAST(MIN(c.n) AS BIGINT) AS est_count
FROM probes p
CROSS JOIN rows4 t
JOIN cells c
  ON c.r = t.r AND c.b = CAST((p.h64 >> (11 * t.r)) % 2048 AS INTEGER)
GROUP BY p.user_id
ORDER BY p.user_id
"""


def link_triangles(sf_dir: str) -> pd.DataFrame:
    """Triangle counting over the page link graph
    (stages/triangles.py, Schank-Wagner degree orientation) — per-host
    triangle-corner counts, the community-density signal next to
    link_degree_stats.  Edges reduce to slim DISTINCT undirected pairs
    map-side; orientation caps every node's wedge fan-out at O(sqrt m)
    (the hot-host guard); wedge→edge matching is the exact map-side
    bloom semi-join, so non-closing wedges drop in place and never
    shuffle.  The oracle enumerates the same (algorithm-independent)
    triangle set with a 3-way self-join and unnests corners."""
    from ..sources.corpus import ensure
    from ..stages.triangles import triangle_corner_hosts

    corpus = ensure("tiny")
    pages = rd.read_parquet(f"{corpus}/pages", columns=["url", "html"])

    return triangle_corner_hosts(pages.map_batches(_link_edges, batch_format="pyarrow"))


_LINK_TRIANGLES_SQL = rf"""
WITH pages AS (
  SELECT url, decode(html) AS html,
         regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host
  FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet')
),
links AS (
  SELECT DISTINCT p.url AS src,
         CASE WHEN href LIKE 'http%' THEN href
              WHEN href = '/' THEN 'https://' || p.host
              ELSE 'https://' || p.host || href END AS dst
  FROM pages p, UNNEST(regexp_extract_all(p.html,
       '<a\s[^>]*?href\s*=\s*["'']([^"''<>]+)["'']', 1)) AS u(href)
),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM links WHERE src <> dst
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT regexp_extract(node, '^[a-z]+://([^/]+)', 1) AS host,
       COUNT(*) AS n_corners
FROM corners GROUP BY host ORDER BY host
"""


def link_clustering(sf_dir: str) -> pd.DataFrame:
    """Per-page local clustering coefficient over the link graph
    (stages/triangles.local_clustering, Watts-Strogatz 1998) for every
    node in at least one triangle — degrees and triangle-corner counts
    are slim groupby products, cc = 2*T/(d*(d-1)) is one IEEE double op
    on exact ints so the SQL twin is bit-identical.  The stage returns a
    Dataset (per-node rows stay distributed at web-graph scale); the
    pandas conversion + sort here is the bounded contract edge."""
    from ..sources.corpus import ensure
    from ..stages.triangles import local_clustering

    corpus = ensure("tiny")
    pages = rd.read_parquet(f"{corpus}/pages", columns=["url", "html"])

    out = local_clustering(
        pages.map_batches(_link_edges, batch_format="pyarrow")
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "node": pd.Series(dtype="object"),
                "degree": pd.Series(dtype="int64"),
                "n_triangles": pd.Series(dtype="int64"),
                "cc": pd.Series(dtype="float64"),
            }
        )
    return out.sort_values("node").reset_index(drop=True)


_LINK_CLUSTERING_SQL = rf"""
WITH pages AS (
  SELECT url, decode(html) AS html,
         regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host
  FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet')
),
links AS (
  SELECT DISTINCT p.url AS src,
         CASE WHEN href LIKE 'http%' THEN href
              WHEN href = '/' THEN 'https://' || p.host
              ELSE 'https://' || p.host || href END AS dst
  FROM pages p, UNNEST(regexp_extract_all(p.html,
       '<a\s[^>]*?href\s*=\s*["'']([^"''<>]+)["'']', 1)) AS u(href)
),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM links WHERE src <> dst
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
),
tcount AS (SELECT node, COUNT(*) AS n_triangles FROM corners GROUP BY node),
deg AS (
  SELECT node, COUNT(*) AS degree FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY node
)
SELECT t.node, d.degree, t.n_triangles,
       2.0 * t.n_triangles / (d.degree * (d.degree - 1.0)) AS cc
FROM tcount t JOIN deg d USING (node)
ORDER BY node
"""


def robots_audit(sf_dir: str) -> pd.DataFrame:
    """Batch robots.txt audit — runs the SAME RobotsCache/RobotsPolicy
    the fetch actors enforce (state/robots.py, J2 broadcast pattern:
    the per-host policy table ships once via ray.put, each worker
    materializes the dict once) over every corpus URL, so the crawler's
    disallow-prefix and crawl-delay semantics are driver-oracle-checked,
    not just fixture-replayed.  Output: (url, allowed, crawl_delay_ms)."""
    import pyarrow.parquet as pq_

    from ..sources.corpus import ensure
    from ..state.robots import DEFAULT_DELAY_MS, RobotsCache

    corpus = ensure("tiny")
    cache_ref = ray.put(RobotsCache.from_arrow(pq_.read_table(f"{corpus}/robots.parquet")))
    urls = rd.read_parquet(f"{corpus}/pages", columns=["url"])

    def audit(batch: pa.Table) -> pa.Table:
        from ..functions.urlnorm import host_of
        from ..stages.join import cached_get

        cache = cached_get(cache_ref, "robots_audit")
        us = batch["url"].to_pylist()
        pols = [cache.get(host_of(u)) for u in us]
        return pa.table(
            {
                "url": batch["url"],
                "allowed": pa.array(
                    np.array([p.allows(u) for p, u in zip(pols, us)], dtype=np.int32)
                ),
                "crawl_delay_ms": pa.array(
                    np.array([p.crawl_delay_ms for p in pols], dtype=np.int64)
                ),
            }
        )

    out = urls.map_batches(audit, batch_format="pyarrow").to_pandas()
    return out.sort_values("url").reset_index(drop=True)


def robots_txt_round_trip(sf_dir: str) -> pd.DataFrame:
    """REAL robots.txt TEXT round-trip under the gate: each host's
    policy row is rendered to canonical robots.txt text
    (state/robots.render_robots_txt), parsed back by the from-scratch
    RFC 9309 parser (parse_robots_txt), and the PARSED policies audit
    every corpus URL — output and oracle identical to robots_audit, so
    a hash match proves text render → parse → enforce loses nothing vs
    the parquet policy path the fetch actors use."""
    import pyarrow.parquet as pq_

    from ..sources.corpus import ensure
    from ..state.robots import (
        RobotsCache,
        RobotsPolicy,
        render_robots_txt,
        robots_table_from_texts,
    )

    corpus = ensure("tiny")
    tbl = pq_.read_table(f"{corpus}/robots.parquet")
    base = RobotsCache.from_arrow(tbl)
    hosts = tbl.column("host").to_pylist()
    texts = [render_robots_txt(base.get(h)) for h in hosts]
    cache_ref = ray.put(RobotsCache.from_arrow(robots_table_from_texts(hosts, texts)))
    urls = rd.read_parquet(f"{corpus}/pages", columns=["url"])

    def audit(batch: pa.Table) -> pa.Table:
        from ..functions.urlnorm import host_of
        from ..stages.join import cached_get

        cache = cached_get(cache_ref, "robots_txt_round_trip")
        us = batch["url"].to_pylist()
        pols = [cache.get(host_of(u)) for u in us]
        return pa.table(
            {
                "url": batch["url"],
                "allowed": pa.array(
                    np.array([p.allows(u) for p, u in zip(pols, us)], dtype=np.int32)
                ),
                "crawl_delay_ms": pa.array(
                    np.array([p.crawl_delay_ms for p in pols], dtype=np.int64)
                ),
            }
        )

    out = urls.map_batches(audit, batch_format="pyarrow").to_pandas()
    return out.sort_values("url").reset_index(drop=True)


_ROBOTS_AUDIT_SQL = rf"""
WITH urls AS (
  -- contract-aligned with the engine's RobotsPolicy (r4 advice): scheme
  -- match is case-insensitive (urlparse accepts 'HTTPS://'), and the
  -- path strips BOTH query and fragment (urlparse().path excludes '#…')
  SELECT url,
         regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1) AS host,
         CASE WHEN regexp_replace(regexp_replace(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+', ''),
                                  '[?#].*$', '') = ''
              THEN '/'
              ELSE regexp_replace(regexp_replace(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+', ''),
                                  '[?#].*$', '') END AS path
  FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet')
),
rules AS (
  SELECT host, UNNEST(disallow) AS rule
  FROM read_parquet('{_TINY_CORPUS}/robots.parquet')
  WHERE len(disallow) > 0
),
denied AS (
  SELECT DISTINCT u.url
  FROM urls u JOIN rules r ON r.host = u.host AND starts_with(u.path, r.rule)
)
SELECT u.url,
       CAST(u.url NOT IN (SELECT url FROM denied) AS INTEGER) AS allowed,
       COALESCE(rb.crawl_delay_ms, 1000) AS crawl_delay_ms
FROM urls u
LEFT JOIN read_parquet('{_TINY_CORPUS}/robots.parquet') rb ON rb.host = u.host
ORDER BY u.url
"""


_IMAGE_FIXTURE_DIR = "/tmp/dc4r_images/v1"


def _ensure_image_fixture(n: int = 400) -> str:
    """Deterministic REAL-format image fixture: n images, alternating
    PPM(P6)/BMP(24-bit), pixels a doc_id-seeded gradient; the parquet
    stores payload + the encode-time truth (width/height/fmt/pixel md5)
    — the WET/WARC fixture discipline for media payloads."""
    import os as _os

    import pyarrow.parquet as _pq

    from ..stages.imagecodec import encode_bmp24, encode_ppm, pixel_md5

    done = f"{_IMAGE_FIXTURE_DIR}/_DONE"
    if not _os.path.exists(done):
        import shutil as _sh

        _sh.rmtree(_IMAGE_FIXTURE_DIR, ignore_errors=True)
        _os.makedirs(_IMAGE_FIXTURE_DIR, exist_ok=True)
        ids, payloads, ws, hs, fmts, digs = [], [], [], [], [], []
        for i in range(n):
            w = 16 + (i * 7) % 48
            h = 16 + (i * 5) % 32
            yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            arr = np.stack(
                [
                    (xx * 3 + i) % 256,
                    (yy * 5 + 2 * i) % 256,
                    (xx + yy + 7 * i) % 256,
                ],
                axis=2,
            ).astype(np.uint8)
            if i % 2 == 0:
                payloads.append(encode_ppm(arr))
                fmts.append("ppm")
            else:
                payloads.append(encode_bmp24(arr))
                fmts.append("bmp")
            ids.append(i)
            ws.append(w)
            hs.append(h)
            digs.append(pixel_md5(arr))
        _pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "payload": pa.array(payloads, pa.binary()),
                    "width": pa.array(ws, pa.int64()),
                    "height": pa.array(hs, pa.int64()),
                    "fmt": pa.array(fmts, pa.string()),
                    "pix_md5_expected": pa.array(digs, pa.string()),
                }
            ),
            f"{_IMAGE_FIXTURE_DIR}/images.parquet",
        )
        open(done, "w").close()
    return _IMAGE_FIXTURE_DIR


def image_real_decode_meta(sf_dir: str) -> pd.DataFrame:
    """REAL image decoding (stages/imagecodec): pure-numpy PPM(P6) and
    24-bit-BMP parsers run in an actor pool over real encoded payloads;
    per-image pixel digests recomputed AFTER decode must match the
    encode-time truth (pix_ok — the WARC-payload-digest discipline for
    media).  The oracle reads the fixture's stored truth columns: the
    engine's decode output hash-matching them proves the format
    round-trip, bit for bit.  Compressed formats (JPEG/PNG) remain the
    documented stub in stages/multimodal.py."""
    from ..stages.imagecodec import RealImageDecodeStage

    fixture = _ensure_image_fixture()
    ds = rd.read_parquet(f"{fixture}/images.parquet")
    out = ds.map_batches(
        RealImageDecodeStage,
        fn_constructor_kwargs={"payload_col": "payload", "id_col": "doc_id"},
        batch_format="pyarrow",
        concurrency=4,
        batch_size=128,
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "width": t["width"],
                "height": t["height"],
                "fmt": t["fmt"],
                "pix_md5": t["pix_md5"],
                "pix_ok": pc.cast(t["pix_ok"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_IMAGE_REAL_DECODE_SQL = f"""
SELECT doc_id, width, height, fmt,
       pix_md5_expected AS pix_md5,
       CAST(1 AS BIGINT) AS pix_ok
FROM read_parquet('{_IMAGE_FIXTURE_DIR}/images.parquet')
ORDER BY doc_id
"""


_AUDIO_FIXTURE_DIR = "/tmp/dc4r_audio/v1"


def _ensure_audio_fixture(n: int = 300, n_windows: int = 4, rate: int = 16000) -> str:
    """Deterministic REAL-format WAV fixture: n mono PCM16 files with
    doc_id-seeded integer sawtooth samples; the truth parquet stores the
    per-window features computed by an INDEPENDENT serial loop at encode
    time, so the oracle checks BOTH the RIFF round-trip and the engine's
    vectorized feature kernel."""
    import os as _os

    import pyarrow.parquet as _pq

    from ..stages.audiocodec import encode_wav_pcm16

    done = f"{_AUDIO_FIXTURE_DIR}/_DONE"
    if not _os.path.exists(done):
        import shutil as _sh

        _sh.rmtree(_AUDIO_FIXTURE_DIR, ignore_errors=True)
        _os.makedirs(_AUDIO_FIXTURE_DIR, exist_ok=True)
        ids, payloads = [], []
        t_id, t_w, t_sq, t_cnt, t_zc = [], [], [], [], []
        for i in range(n):
            ln = 800 + (i * 37) % 400
            t = np.arange(ln, dtype=np.int64)
            samples = (((t * (i % 7 + 3)) % 2001) - 1000).astype(np.int16)
            ids.append(i)
            payloads.append(encode_wav_pcm16(samples, rate))
            # independent serial truth
            s = samples.astype(int).tolist()
            for j in range(n_windows):
                lo, hi = j * ln // n_windows, (j + 1) * ln // n_windows
                win = s[lo:hi]
                zc = 0
                for a, b in zip(win, win[1:]):
                    if (a > 0 and b < 0) or (a < 0 and b > 0):
                        zc += 1
                t_id.append(i)
                t_w.append(j)
                t_sq.append(sum(x * x for x in win))
                t_cnt.append(len(win))
                t_zc.append(zc)
        _pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "payload": pa.array(payloads, pa.binary()),
                }
            ),
            f"{_AUDIO_FIXTURE_DIR}/audio.parquet",
        )
        _pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(t_id, pa.int64()),
                    "window_idx": pa.array(t_w, pa.int64()),
                    "sumsq": pa.array(t_sq, pa.int64()),
                    "n_samples": pa.array(t_cnt, pa.int64()),
                    "zero_cross": pa.array(t_zc, pa.int64()),
                    "sample_rate": pa.array([rate] * len(t_id), pa.int64()),
                }
            ),
            f"{_AUDIO_FIXTURE_DIR}/truth.parquet",
        )
        open(done, "w").close()
    return _AUDIO_FIXTURE_DIR


def audio_wav_features(sf_dir: str) -> pd.DataFrame:
    """REAL audio decoding (stages/audiocodec): a from-scratch RIFF/WAV
    PCM16 parser (chunk walk, word alignment, channel-0 downmix) feeds
    vectorized per-window features — integer-exact mean-square energy
    (sumsq, n_samples) and zero-crossing counts — in an actor pool.
    The oracle reads the fixture's encode-time truth computed by an
    independent serial loop: hash equality proves the WAV round-trip
    AND the vectorized kernel.  Compressed audio remains the documented
    stub (stages/multimodal.py)."""
    from ..stages.audiocodec import WavFeatureStage

    fixture = _ensure_audio_fixture()
    ds = rd.read_parquet(f"{fixture}/audio.parquet")
    out = ds.map_batches(
        WavFeatureStage,
        fn_constructor_kwargs={"payload_col": "payload", "id_col": "doc_id"},
        batch_format="pyarrow",
        concurrency=4,
        batch_size=64,
    ).to_pandas()
    return out.sort_values(["doc_id", "window_idx"]).reset_index(drop=True)


_AUDIO_WAV_SQL = f"""
SELECT doc_id, window_idx, sumsq, n_samples, zero_cross, sample_rate
FROM read_parquet('{_AUDIO_FIXTURE_DIR}/truth.parquet')
ORDER BY doc_id, window_idx
"""


_VIDEO_FIXTURE_DIR = "/tmp/dc4r_video/v1"


def _ensure_video_fixture(n: int = 120, k: int = 4) -> str:
    """Deterministic REAL-format Y4M fixture: n clips with doc_id-seeded
    frame counts/geometry and gradient luma; the truth parquet stores the
    sampled-frame features from an independent serial computation."""
    import hashlib as _hl
    import os as _os

    import pyarrow.parquet as _pq

    from ..stages.videocodec import encode_y4m

    done = f"{_VIDEO_FIXTURE_DIR}/_DONE"
    if not _os.path.exists(done):
        import shutil as _sh

        _sh.rmtree(_VIDEO_FIXTURE_DIR, ignore_errors=True)
        _os.makedirs(_VIDEO_FIXTURE_DIR, exist_ok=True)
        ids, payloads = [], []
        t_id, t_f, t_w, t_h, t_lm, t_md5 = [], [], [], [], [], []
        for i in range(n):
            nf = 2 + (i * 3) % 9
            w = 16 + 2 * ((i * 5) % 8)
            h = 8 + 2 * ((i * 7) % 6)
            yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            frames = np.stack(
                [((xx * 2 + yy * 3 + 11 * i + 17 * f) % 256) for f in range(nf)]
            ).astype(np.uint8)
            ids.append(i)
            payloads.append(encode_y4m(frames))
            # independent serial truth for the k evenly-spaced samples
            if nf <= k:
                idxs = list(range(nf))
            else:
                idxs = sorted({j * (nf - 1) // (k - 1) for j in range(k)})
            for fi in idxs:
                luma = frames[fi]
                t_id.append(i)
                t_f.append(fi)
                t_w.append(w)
                t_h.append(h)
                t_lm.append(int(sum(int(x) for x in luma.ravel())) * 100 // (w * h))
                t_md5.append(_hl.md5(luma.tobytes()).hexdigest())
        _pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "payload": pa.array(payloads, pa.binary()),
                }
            ),
            f"{_VIDEO_FIXTURE_DIR}/clips.parquet",
        )
        _pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(t_id, pa.int64()),
                    "frame_idx": pa.array(t_f, pa.int64()),
                    "width": pa.array(t_w, pa.int64()),
                    "height": pa.array(t_h, pa.int64()),
                    "luma_mean_x100": pa.array(t_lm, pa.int64()),
                    "luma_md5": pa.array(t_md5, pa.string()),
                }
            ),
            f"{_VIDEO_FIXTURE_DIR}/truth.parquet",
        )
        open(done, "w").close()
    return _VIDEO_FIXTURE_DIR


def video_frame_samples(sf_dir: str) -> pd.DataFrame:
    """REAL video frame sampling (stages/videocodec): a from-scratch Y4M
    (YUV4MPEG2) parser walks frame markers and extracts k evenly-spaced
    luma planes — unsampled frames are skipped by size, so per-clip work
    is O(header + k·frame) — with integer-exact per-frame features and
    luma digests hash-checked against an independent encode-time truth.
    Compressed video remains the documented stub (stages/multimodal.py)."""
    from ..stages.videocodec import Y4mFrameSampleStage

    fixture = _ensure_video_fixture()
    ds = rd.read_parquet(f"{fixture}/clips.parquet")
    out = ds.map_batches(
        Y4mFrameSampleStage,
        fn_constructor_kwargs={"payload_col": "payload", "id_col": "doc_id"},
        batch_format="pyarrow",
        concurrency=4,
        batch_size=32,
    ).to_pandas()
    return out.sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)


_VIDEO_FRAME_SQL = f"""
SELECT doc_id, frame_idx, width, height, luma_mean_x100, luma_md5
FROM read_parquet('{_VIDEO_FIXTURE_DIR}/truth.parquet')
ORDER BY doc_id, frame_idx
"""


def corpus_report(sf_dir: str) -> pd.DataFrame:
    """COMPOSED per-language corpus report — the dataset-card table a
    training run consumes: volume (token_stats_by_lang), quality
    (quality_by_lang mean token length), the Gopher gate's survivor
    count (gopher_quality_gate) and the exact-dedup redundancy rate
    (stages/dedup.exact_dedup_losers → lang attach via the guarded
    lookup_join → one partial-agg groupby), joined per lang.  Each
    input is an already-oracle-green pipeline; this query checks their
    INTERACTION under ONE SQL — the webgraph_report composition
    discipline applied to the documents table."""
    from ..stages.dedup import exact_dedup_losers
    from ..stages.join import lookup_join

    tok = token_stats_by_lang(sf_dir)
    qual = quality_by_lang(sf_dir)[["lang", "avg_mean_token_len"]]
    gopher = gopher_quality_gate(sf_dir)[["lang", "n_kept"]].rename(
        columns={"n_kept": "n_gopher_kept"}
    )

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    losers = exact_dedup_losers(
        docs.select_columns(["doc_id", "text"]), "doc_id", "text"
    )
    slim = docs.select_columns(["doc_id", "lang"])
    per_lang = partial_grouped_sum(
        lookup_join(losers, slim, on="doc_id"), ["lang"], count_alias="n_dup_losers"
    ).to_pandas()

    out = tok.merge(qual, on="lang").merge(gopher, on="lang")
    if "lang" in per_lang.columns:  # a dup-free corpus yields an empty
        out = out.merge(per_lang[["lang", "n_dup_losers"]], on="lang", how="left")
    else:  # column-less frame (Ray drops all-empty blocks)
        out["n_dup_losers"] = 0
    out["n_dup_losers"] = out["n_dup_losers"].fillna(0).astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


def _corpus_report_sql() -> str:
    R = _GOPHER_RULES
    stop_list = ", ".join(f"'{s}'" for s in _GOPHER_STOPWORDS)
    return f"""
WITH tokstats AS (
  SELECT lang,
         CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS total_tokens,
         COUNT(*) AS n_docs,
         ROUND(SUM(length(text) - length(replace(text, ' ', '')) + 1) * 1.0 / COUNT(*), 4) AS avg_tokens,
         ROUND(AVG((length(text) - (length(text) - length(replace(text, ' ', ''))))
                   / ((length(text) - length(replace(text, ' ', ''))) + 1.0)), 4) AS avg_mean_token_len
  FROM documents GROUP BY lang
),
tok AS (
  SELECT doc_id, lang, regexp_extract_all(lower(text), '\\w+') AS w FROM documents
),
g AS (
  SELECT doc_id, lang, len(w) AS n_tok,
         CASE WHEN len(w) = 0 THEN 0.0
              ELSE length(array_to_string(w, '')) * 1.0 / len(w) END AS mwl,
         len(list_filter(w, x -> x IN ({stop_list}))) AS n_stop,
         [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))] AS g2,
         [w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w) - 1)] AS g3
  FROM tok
),
t2 AS (
  SELECT doc_id, MAX(c) AS maxc FROM (
    SELECT doc_id, gram, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(g2) AS gram FROM g) GROUP BY doc_id, gram
  ) GROUP BY doc_id
),
t3 AS (
  SELECT doc_id, 1.0 - COUNT(DISTINCT gram) * 1.0 / COUNT(*) AS dup3
  FROM (SELECT doc_id, unnest(g3) AS gram FROM g) GROUP BY doc_id
),
gopher AS (
  SELECT g.lang, CAST(SUM(CASE WHEN
      g.n_tok BETWEEN {R["min_tok"]} AND {R["max_tok"]}
      AND g.mwl >= {R["min_wl"]} AND g.mwl <= {R["max_wl"]}
      AND NOT ((CASE WHEN g.n_tok >= 2 THEN 2.0 * t2.maxc / g.n_tok ELSE 0.0 END) > {R["max_rep"]}
               OR COALESCE(t3.dup3, 0.0) > {R["max_rep"]})
      AND g.n_stop >= {R["min_stop"]}
    THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_kept
  FROM g LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
  GROUP BY g.lang
),
dup AS (
  SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_dup_losers
  FROM documents d
  WHERE d.doc_id NOT IN (SELECT MIN(doc_id) FROM documents GROUP BY md5(text))
  GROUP BY d.lang
)
SELECT t.lang, t.total_tokens, t.n_docs, t.avg_tokens, t.avg_mean_token_len,
       gp.n_gopher_kept, COALESCE(dp.n_dup_losers, 0) AS n_dup_losers
FROM tokstats t
JOIN gopher gp ON gp.lang = t.lang
LEFT JOIN dup dp ON dp.lang = t.lang
ORDER BY t.lang
"""


def webgraph_report(sf_dir: str) -> pd.DataFrame:
    """COMPOSED per-host web-graph report — the host authority/density
    table a crawl scheduler consumes: inlink shape (link_degree_stats),
    community density (link_triangles corner counts) and domain
    authority (hostrank_corpus) joined per host.  Each input is an
    already-oracle-green distributed pipeline; this query checks their
    INTERACTION (host-key agreement across page-level, undirected and
    host-contracted edge derivations) under ONE SQL oracle, the
    fineweb/ccnet composition discipline applied to the graph family."""
    deg = link_degree_stats(sf_dir)
    tri = link_triangles(sf_dir)
    hr = hostrank_corpus(sf_dir).rename(columns={"pr": "host_pr"})
    out = deg.merge(tri, on="host", how="left")
    out["n_corners"] = out["n_corners"].fillna(0).astype("int64")
    out = out.merge(hr, on="host", how="inner")
    return out.sort_values("host").reset_index(drop=True)


def _webgraph_sql(iters: int = 3) -> str:
    """webgraph_report oracle: link_degree + triangle-corner + the
    host-contracted unrolled PageRank chain (renamed h{k} CTEs), joined
    per host."""
    parts = [
        rf"""
WITH pages AS (
  SELECT url, decode(html) AS html,
         regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host
  FROM read_parquet('{_TINY_CORPUS}/pages/*.parquet')
), plinks AS (
  SELECT DISTINCT p.url AS src,
         CASE WHEN href LIKE 'http%' THEN href
              WHEN href = '/' THEN 'https://' || p.host
              ELSE 'https://' || p.host || href END AS dst
  FROM pages p, UNNEST(regexp_extract_all(p.html,
       '<a\s[^>]*?href\s*=\s*["'']([^"''<>]+)["'']', 1)) AS u(href)
), indeg AS (SELECT dst, COUNT(*) AS indegree FROM plinks GROUP BY dst),
degstats AS (
  SELECT regexp_extract(dst, '^[a-z]+://([^/]+)', 1) AS host,
         COUNT(*) AS n_targets,
         CAST(SUM(indegree) AS BIGINT) AS total_inlinks,
         MAX(indegree) AS max_indegree
  FROM indeg GROUP BY host
), und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM plinks WHERE src <> dst
), tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
), tri_host AS (
  SELECT regexp_extract(node, '^[a-z]+://([^/]+)', 1) AS host,
         COUNT(*) AS n_corners
  FROM (SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri)
  GROUP BY host
), hraw AS (
  SELECT p.host AS src,
         CASE WHEN href LIKE 'http%' THEN regexp_extract(href, '^[a-z]+://([^/]+)', 1)
              ELSE p.host END AS dst
  FROM pages p, UNNEST(regexp_extract_all(p.html,
       '<a\s[^>]*?href\s*=\s*["'']([^"''<>]+)["'']', 1)) AS u(href)
), hlinks AS (SELECT DISTINCT src, dst FROM hraw),
hnodes AS (SELECT src AS node FROM hlinks UNION SELECT dst FROM hlinks),
hnn AS (SELECT COUNT(*) * 1.0 AS n FROM hnodes),
houtdeg AS (SELECT src, COUNT(*) * 1.0 AS deg FROM hlinks GROUP BY src),
h0 AS (SELECT node, 1.0 / (SELECT n FROM hnn) AS pr FROM hnodes)"""
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f""",
h{k} AS (
  SELECT nd.node,
         0.15 / (SELECT n FROM hnn)
         + 0.85 * (COALESCE(s.in_pr, 0)
            + (1 - (SELECT SUM(r.pr) FROM h{p} r JOIN houtdeg o ON o.src = r.node))
              / (SELECT n FROM hnn)) AS pr
  FROM hnodes nd LEFT JOIN (
    SELECT l.dst AS node, SUM(r.pr / o.deg) AS in_pr
    FROM hlinks l JOIN h{p} r ON r.node = l.src JOIN houtdeg o ON o.src = l.src
    GROUP BY l.dst) s ON s.node = nd.node
)"""
        )
    parts.append(
        f"""
SELECT d.host, d.n_targets, d.total_inlinks, d.max_indegree,
       COALESCE(t.n_corners, 0) AS n_corners,
       ROUND(hr.pr, 6) AS host_pr
FROM degstats d
LEFT JOIN tri_host t ON t.host = d.host
JOIN h{iters} hr ON hr.node = d.host
ORDER BY d.host"""
    )
    return "".join(parts)


# =========================================================================
# Registry
# =========================================================================

QUERIES = {
    "q1_lineitem_agg": q1_lineitem_agg,
    "orders_status_counts": orders_status_counts,
    "region_customer_rollup": region_customer_rollup,
    "q3_top_revenue": q3_top_revenue,
    "q5_region_revenue": q5_region_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "distinct_users_by_type": distinct_users_by_type,
    "events_in_windows": events_in_windows,
    "top3_events_per_user": top3_events_per_user,
    "value_quantiles_by_type": value_quantiles_by_type,
    "customers_without_orders": customers_without_orders,
    "jaccard_adjacent_docs": jaccard_adjacent_docs,
    "events_hourly": events_hourly,
    "user_sessions": user_sessions,
    "due_events": due_events,
    "first_event_per_key": first_event_per_key,
    "top_users_by_events": top_users_by_events,
    "token_stats_by_lang": token_stats_by_lang,
    "top_tokens": top_tokens,
    "bm25_top10": bm25_top10,
    "bpe_token_stats": bpe_token_stats,
    "lang_id_counts": lang_id_counts,
    "quality_by_lang": quality_by_lang,
    "source_stats": source_stats,
    "normalized_sources": normalized_sources,
    "doc_fingerprints": doc_fingerprints,
    "dedup_exact_docs": dedup_exact_docs,
    "knn_cosine_top10": knn_cosine_top10,
    "kmeans_clusters": kmeans_clusters,
    "semdedup_docs": semdedup_docs,
    "semdedup_reps": semdedup_reps,
    "knn_join_top5": knn_join_top5,
    "source_disjoint_split": source_disjoint_split,
    "knn_ivf_top10": knn_ivf_top10,
    "knn_ivf_indexed_top10": knn_ivf_indexed_top10,
    "knn_ivf_appended_top10": knn_ivf_appended_top10,
    "knn_pq_top10": knn_pq_top10,
    "knn_pq_refine_all": knn_pq_refine_all,
    "embedding_label_stats": embedding_label_stats,
    "embedding_near_dup_pairs": embedding_near_dup_pairs,
    "minhash_near_dups": minhash_near_dups,
    "minhash_dup_clusters": minhash_dup_clusters,
    "clean_corpus_stats": clean_corpus_stats,
    "simhash_near_dups": simhash_near_dups,
    "simhash_signatures": simhash_signatures,
    "image_decode_meta": image_decode_meta,
    "image_resize_meta": image_resize_meta,
    "audio_window_features": audio_window_features,
    "frame_samples": frame_samples,
    "parts_by_brand": parts_by_brand,
    "supplier_balance_by_nation": supplier_balance_by_nation,
    "props_k_stats": props_k_stats,
    "asof_last_click": asof_last_click,
    "events_rolling_sum": events_rolling_sum,
    "hash_sampled_events": hash_sampled_events,
    "users_in_both_types": users_in_both_types,
    "llm_extract_stub": llm_extract_stub,
    "selector_tag_counts": selector_tag_counts,
    "page_metadata": page_metadata,
    "crawl_tiny_e2e": crawl_tiny_e2e,
    "crawl_extract_e2e": crawl_extract_e2e,
    "crawl_reachability": crawl_reachability,
    "extract_corpus_text": extract_corpus_text,
    "pii_redacted_docs": pii_redacted_docs,
    "repetition_by_lang": repetition_by_lang,
    "contaminated_docs": contaminated_docs_q,
    "stratified_events_sample": stratified_events_sample,
    "bm25_indexed_top10": bm25_indexed_top10,
    "bm25_appended_top10": bm25_appended_top10,
    "seq_packing": seq_packing,
    "encoded_docs": encoded_docs,
    "top_bigrams": top_bigrams,
    "delta_novel_docs": delta_novel_docs,
    "tfidf_top_terms": tfidf_top_terms,
    "pagerank_corpus": pagerank_corpus,
    "shuffled_export": shuffled_export,
    "quality_model_scores": quality_model_scores,
    "fasttext_doc_labels": fasttext_doc_labels,
    "delta_near_dup_docs": delta_near_dup_docs,
    "mixture_sampled_docs": mixture_sampled_docs,
    "weighted_doc_sample": weighted_doc_sample,
    "dup_span_pairs": dup_span_pairs,
    "span_removed_docs": span_removed_docs,
    "wet_extract": wet_extract,
    "warc_response_extract": warc_response_extract,
    "chunked_docs": chunked_docs,
    "crawl_snapshot_diff": crawl_snapshot_diff,
    "anchor_text_agg": anchor_text_agg,
    "c4_cleaned_pages": c4_cleaned_pages,
    "cdx_host_lookup": cdx_host_lookup,
    "temperature_lang_sample": temperature_lang_sample,
    "recrawl_priority_plan": recrawl_priority_plan,
    "dup_cluster_reps": dup_cluster_reps,
    "link_degree_stats": link_degree_stats,
    "gopher_quality_gate": gopher_quality_gate,
    "training_data_pipeline": training_data_pipeline,
    "hits_corpus": hits_corpus,
    "boilerplate_removed_docs": boilerplate_removed_docs,
    "para_deduped_docs": para_deduped_docs,
    "quality_top_decile": quality_top_decile,
    "fineweb_pipeline": fineweb_pipeline,
    "langid_model_scores": langid_model_scores,
    "ngram_perplexity": ngram_perplexity,
    "ngram_perplexity_join": ngram_perplexity_join,
    "dsir_selected_docs": dsir_selected_docs,
    "ccnet_ppl_buckets": ccnet_ppl_buckets,
    "blocklist_filtered_docs": blocklist_filtered_docs,
    "hostrank_corpus": hostrank_corpus,
    "host_components": host_components,
    "canonical_url_groups": canonical_url_groups,
    "warc_export_hosts": warc_export_hosts,
    "bpe_merges": bpe_merges,
    "hll_user_registers": hll_user_registers,
    "crawl_trap_hosts": crawl_trap_hosts,
    "phrase_search_docs": phrase_search_docs,
    "cms_user_est": cms_user_est,
    "link_triangles": link_triangles,
    "link_clustering": link_clustering,
    "robots_audit": robots_audit,
    "robots_txt_round_trip": robots_txt_round_trip,
    "webgraph_report": webgraph_report,
    "corpus_report": corpus_report,
    "image_real_decode_meta": image_real_decode_meta,
    "audio_wav_features": audio_wav_features,
    "video_frame_samples": video_frame_samples,
    "nfc_normalized_docs": nfc_normalized_docs,
    "ccnet_pipeline": ccnet_pipeline,
}

ORACLES = {
    "q1_lineitem_agg": _Q1_SQL,
    "orders_status_counts": _ORDERS_STATUS_SQL,
    "region_customer_rollup": _REGION_CUSTOMER_SQL,
    "q3_top_revenue": _Q3_SQL,
    "q5_region_revenue": _Q5_SQL,
    "q7_volume_shipping": _Q7_SQL,
    "distinct_users_by_type": _DISTINCT_USERS_SQL,
    "events_in_windows": _RANGE_JOIN_SQL,
    "top3_events_per_user": _TOP3_SQL,
    "value_quantiles_by_type": _QUANTILES_SQL,
    "customers_without_orders": _ANTI_SQL,
    "jaccard_adjacent_docs": _JACCARD_ADJ_SQL,
    "events_hourly": _EVENTS_HOURLY_SQL,
    "user_sessions": _SESSIONS_SQL,
    "due_events": _DUE_SQL,
    "first_event_per_key": _FIRST_EVENT_SQL,
    "top_users_by_events": _TOP_USERS_SQL,
    "token_stats_by_lang": _TOKEN_STATS_SQL,
    "top_tokens": _TOP_TOKENS_SQL,
    "bm25_top10": _BM25_SQL,
    "bpe_token_stats": _BPE_TOKEN_SQL,
    "quality_by_lang": _QUALITY_SQL,
    "source_stats": _SOURCE_STATS_SQL,
    "normalized_sources": _NORM_SOURCES_SQL,
    "doc_fingerprints": _FINGERPRINT_SQL,
    "dedup_exact_docs": _DEDUP_EXACT_SQL,
    "knn_cosine_top10": _KNN_SQL,
    "kmeans_clusters": _KMEANS_SQL,
    "semdedup_docs": _SEMDEDUP_SQL,
    "semdedup_reps": _SEMDEDUP_REPS_SQL,
    "knn_join_top5": _KNN_JOIN_SQL,
    "source_disjoint_split": _SPLIT_SQL,
    "knn_ivf_top10": _IVF_SQL,
    "knn_ivf_indexed_top10": _IVF_SQL,
    "knn_ivf_appended_top10": _IVF_SQL,
    "knn_pq_refine_all": _KNN_SQL,
    "embedding_label_stats": _EMB_STATS_SQL,
    "image_decode_meta": _IMAGE_DECODE_SQL,
    "image_resize_meta": _IMAGE_RESIZE_SQL,
    "audio_window_features": _AUDIO_FEATURES_SQL,
    "llm_extract_stub": _LLM_STUB_SQL,
    "parts_by_brand": _PARTS_SQL,
    "supplier_balance_by_nation": _SUPPLIER_SQL,
    "props_k_stats": _PROPS_SQL,
    "asof_last_click": _ASOF_SQL,
    "events_rolling_sum": _ROLLING_SQL,
    "hash_sampled_events": _HASH_SAMPLE_SQL,
    "users_in_both_types": _INTERSECT_SQL,
    "clean_corpus_stats": _CLEAN_SQL,
    "embedding_near_dup_pairs": _EMB_NEAR_DUP_SQL,
    "minhash_near_dups": _MINHASH_PAIRS_SQL,
    "minhash_dup_clusters": _MINHASH_CLUSTERS_SQL,
    "frame_samples": _FRAME_SAMPLES_SQL,
    "lang_id_counts": _LANG_ID_SQL,
    "selector_tag_counts": _SELECTOR_SQL,
    "page_metadata": _PAGE_META_SQL,
    "extract_corpus_text": _EXTRACT_CORPUS_SQL,
    "crawl_reachability": _REACH_SQL,
    "crawl_tiny_e2e": _CRAWL_E2E_SQL,
    "crawl_extract_e2e": _CRAWL_EXTRACT_SQL,
    "pii_redacted_docs": _PII_SQL,
    "repetition_by_lang": _REPETITION_SQL,
    "contaminated_docs": _CONTAM_SQL,
    "stratified_events_sample": _STRATIFIED_SQL,
    "bm25_indexed_top10": _BM25_SQL,
    "bm25_appended_top10": _BM25_SQL,
    "seq_packing": _PACK_SQL,
    "encoded_docs": _ENCODED_DOCS_SQL,
    "top_bigrams": _TOP_BIGRAMS_SQL,
    "delta_novel_docs": _DELTA_NOVEL_SQL,
    "tfidf_top_terms": _TFIDF_SQL,
    "pagerank_corpus": _pagerank_sql(3),
    "shuffled_export": _SHUFFLE_EXPORT_SQL,
    "quality_model_scores": _quality_model_sql(),
    "fasttext_doc_labels": _FASTTEXT_SQL,
    "delta_near_dup_docs": _DELTA_NEAR_DUP_SQL,
    "mixture_sampled_docs": _mixture_sql(),
    "weighted_doc_sample": _WEIGHTED_SAMPLE_SQL,
    "dup_span_pairs": _DUP_SPANS_SQL,
    "span_removed_docs": _SPAN_REMOVED_SQL,
    "wet_extract": _WET_EXTRACT_SQL,
    "warc_response_extract": _WARC_RESPONSE_SQL,
    "chunked_docs": _CHUNKED_DOCS_SQL,
    "crawl_snapshot_diff": _SNAPSHOT_DIFF_SQL,
    "anchor_text_agg": _anchor_sql(),
    "c4_cleaned_pages": _C4_CLEAN_SQL,
    "cdx_host_lookup": _CDX_SQL,
    "temperature_lang_sample": _TEMPERATURE_SQL,
    "recrawl_priority_plan": _RECRAWL_SQL,
    "dup_cluster_reps": _DUP_CLUSTER_REPS_SQL,
    "link_degree_stats": _LINK_DEGREE_SQL,
    "hll_user_registers": _HLL_REGISTERS_SQL,
    "crawl_trap_hosts": _TRAP_HOSTS_SQL,
    "phrase_search_docs": _PHRASE_SEARCH_SQL,
    "cms_user_est": _CMS_EST_SQL,
    "link_triangles": _LINK_TRIANGLES_SQL,
    "link_clustering": _LINK_CLUSTERING_SQL,
    "robots_audit": _ROBOTS_AUDIT_SQL,
    "robots_txt_round_trip": _ROBOTS_AUDIT_SQL,
    "webgraph_report": _webgraph_sql(3),
    "corpus_report": _corpus_report_sql(),
    "image_real_decode_meta": _IMAGE_REAL_DECODE_SQL,
    "audio_wav_features": _AUDIO_WAV_SQL,
    "video_frame_samples": _VIDEO_FRAME_SQL,
    "gopher_quality_gate": _gopher_sql(),
    "training_data_pipeline": _training_pipeline_sql(),
    "hits_corpus": _hits_sql(2),
    "boilerplate_removed_docs": _BOILERPLATE_SQL,
    "para_deduped_docs": _PARA_DEDUP_SQL,
    "quality_top_decile": _QUALITY_TOP_DECILE_SQL,
    "fineweb_pipeline": _FINEWEB_SQL,
    "langid_model_scores": _LANGID_SQL,
    "simhash_signatures": _SIMHASH_SIG_SQL,
    "simhash_near_dups": _SIMHASH_PAIRS_SQL,
    "ngram_perplexity": _NGRAM_PPL_SQL,
    "ngram_perplexity_join": _NGRAM_PPL_SQL,
    "dsir_selected_docs": _DSIR_SQL,
    "ccnet_ppl_buckets": _CCNET_BUCKET_SQL,
    "blocklist_filtered_docs": _BLOCKLIST_SQL,
    "hostrank_corpus": _hostrank_sql(3),
    "host_components": _HOST_COMPONENTS_SQL,
    "canonical_url_groups": _CANONICAL_URL_SQL,
    "warc_export_hosts": _WARC_EXPORT_SQL,
    "nfc_normalized_docs": _NFC_SQL,
    "ccnet_pipeline": _CCNET_PIPELINE_SQL,
    # rows-only (non-SQL-expressible): knn_pq_top10 (approximate by
    # design; refine≥N==brute-force and recall-bound pytests — the
    # exact-refine twin knn_pq_refine_all IS oracle-backed),
    # crawl_tiny_e2e (fetch_seq ORDER is engine-defined; the SEEN SET +
    # statuses are hash-checked by crawl_reachability, order by
    # byte-frozen fixtures)
}
