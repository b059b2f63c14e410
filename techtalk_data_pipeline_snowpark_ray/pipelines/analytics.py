"""Derived-analytics pipelines: Ray-Data re-expressions of the
reference's query layer over the driver-provided testdata tables.

Reference parity map (SURVEY.md §2):
  q1_pricing_summary      A1/A2/T11  group-agg + computed measures
  dq_overpaid_orders      DQOrderPaidMoreThanPrice.scala:20-53 (A1+J1+T6)
  urgent_orders_by_nation PaidWithAmexRatingGt50.scala:22-83 (T5+J2/J3/J4)
  top_segments_last7d     TopRestaurantsLast30Days.scala:16-39 (T9+A2+J5+O1)
  derived_key_join        SampleStream.scala:64-89 (T10+J6)
  crud_filter_dedup       SampleCrud.scala:9-26 (T7+T8+O3)
  union_tag               IngestPaymentsStreamFromStage.scala:61-63 (O2+T4)
  events_tumbling_window  §2.8 streaming semantics as bounded groupby
  events_sessionize       §2.8 stateful windowing via groupby.map_groups
  props_json_extract      T1/T3 parse_json + field projection

Scale notes (applied uniformly):
  * every read prunes columns at the source (`columns=[...]`);
  * money/value aggregates go through functions.numeric.cents so sums
    are exact integers (order-independent => distributed == oracle);
  * Ray's groupby().aggregate() already combines per block before the
    shuffle (partial aggregation); map_groups is used only where
    per-group sequential logic is required (sessionize);
  * joins use Dataset.join (hash-partitioned); genuinely small dims
    could instead be broadcast via ray.put -- see cdc_queries/dedup for
    that pattern.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.numeric import cents_arrow
from ..stages.exchange import exchange_map_groups
from ..stages.joins import auto_join, broadcast_join

def _cluster_cpus() -> int:
    import ray
    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", 8) or 8)
    return 8


def join_partitions() -> int:
    """Partitions for Dataset.join, sized to the session's cores (the
    round-1 fixed constant could not follow the cluster)."""
    return max(8, min(_cluster_cpus() // 2, 64))


def agg_partitions() -> int:
    """Partitions for hash aggregates: Ray's default of 200 spins up
    200 aggregator actors (pure fixed cost at these input sizes); one
    per core follows the cluster instead."""
    return max(8, min(_cluster_cpus(), 128))





#: partial-row count above which small_groupby switches its merge from
#: the driver to the routed exchange -- the guard that keeps a misuse
#: with an unbounded key (per-order, per-doc) from becoming a driver
#: memory bomb
DRIVER_MERGE_MAX_ROWS = 200_000

#: last merge strategy chosen by small_groupby ("driver" | "exchange"),
#: recorded for tests/observability
LAST_GROUPBY_PATH: str | None = None


def small_groupby(ds: ray.data.Dataset, keys, agg_spec: dict,
                  batch_size: int | None = None,
                  driver_merge_max_rows: int = DRIVER_MERGE_MAX_ROWS
                  ) -> pd.DataFrame:
    """Grouped aggregate for BOUNDED group cardinality (dimension-like
    keys: segments, nations, event types): one vectorized pandas
    partial per batch (<= n_groups rows each) and a tiny driver merge.

    Ray 2.49's hash-shuffle `.aggregate()` spins `num_partitions`
    aggregator actors per call -- ~7s of pure startup to reduce a few
    thousand rows to 5 groups (measured). Partial+merge ships
    n_groups x n_blocks rows total, which for bounded n_groups stays
    O(small) at any corpus size.

    CARDINALITY GUARD: the partials are MEASURED before merging; past
    `driver_merge_max_rows` the merge runs as a key-hash-routed
    exchange (each key wholly in one partition, one vectorized merge
    per partition) instead of on the driver -- so a call with an
    unbounded key degrades to the distributed reduce rather than a
    driver memory bomb. (The result itself is then per-key-sized;
    callers wanting a Dataset back for truly huge outputs should use
    the exchange directly, e.g. dq_overpaid_orders.)

    agg_spec: {out_col: (src_col, fn)} with fn in
    {"sum", "count", "max", "min"}; count merges as sum of partials.
    """
    global LAST_GROUPBY_PATH
    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: SQL GROUP BY keeps a NULL group; pandas'
        # default silently drops those rows from every aggregate
        g = b.groupby(keys, sort=False, as_index=False, dropna=False)
        cols = {}
        for out, (src, fn) in agg_spec.items():
            if fn == "count":
                # COUNT(*) semantics — every oracle counts rows, so
                # null measures are included by design
                s = g.size().rename(columns={"size": out})
            else:
                s = getattr(g[src], fn)().rename(columns={src: out})
            cols[out] = s[out]
            key_frame = s[keys]
        return pd.concat([key_frame] + [c.to_frame() for c in cols.values()],
                         axis=1)

    merge_fn = {out: ("sum" if fn == "count" else fn)
                for out, (_src, fn) in agg_spec.items()}

    def merge_frame(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, as_index=False, dropna=False)
        return g.agg(**{out: (out, fn) for out, fn in merge_fn.items()})

    parts_ds = ds.map_batches(partial, batch_format="pandas",
                              batch_size=batch_size).materialize()
    if parts_ds.count() <= driver_merge_max_rows:
        LAST_GROUPBY_PATH = "driver"
        return merge_frame(parts_ds.to_pandas())

    LAST_GROUPBY_PATH = "exchange"
    nparts = agg_partitions()

    def route(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        # deterministic row hash of the key columns (stable across
        # worker processes), so every key lands wholly in one partition
        h = pd.util.hash_pandas_object(b[keys], index=False).to_numpy()
        b["_part"] = (h % np.uint64(nparts)).astype(np.int32)
        return b

    routed = parts_ds.map_batches(route, batch_format="pandas")
    return exchange_map_groups(routed, "_part", nparts,
                               merge_frame).to_pandas()


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    from ..sources.tables import read_table
    return read_table(sf_dir, table, columns)


# -- Q1-style pricing summary (A1/A2/T11) ----------------------------------

def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"])

    def measures(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1997-01-01"))))
        disc = pc.multiply(pc.cast(t["l_extendedprice"], pa.float64()),
                           pc.subtract(pa.scalar(1.0), pc.cast(t["l_discount"], pa.float64())))
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty_c": cents_arrow(t["l_quantity"]),
            "base_c": cents_arrow(t["l_extendedprice"]),
            "disc_c": cents_arrow(disc),
        })

    pre = ds.map_batches(measures, batch_format="pyarrow", zero_copy_batch=True)
    agg = small_groupby(pre, ["l_returnflag", "l_linestatus"], {
        "sum_qty_c": ("qty_c", "sum"), "sum_base_c": ("base_c", "sum"),
        "sum_disc_c": ("disc_c", "sum"), "count_order": ("qty_c", "count")})
    agg["avg_qty"] = (agg["sum_qty_c"].astype("float64") / 100.0) \
        / agg["count_order"].astype("float64")
    return agg.sort_values(["l_returnflag", "l_linestatus"],
                           ignore_index=True)


# -- data-quality: orders whose line revenue exceeds the header total ------
# (group-sum per key -> join back -> col-vs-col comparison filter)

def dq_overpaid_orders(sf_dir: str) -> ray.data.Dataset:
    """Group-sum per key ⋈ fact + col-vs-col filter, as ONE routed
    co-partition stage: both sides hash-route by o_orderkey into K
    coarse partitions (a key lands wholly in one partition), and each
    partition does the sum + inner merge + rev>tot filter in a single
    vectorized pandas call. Same exchange volume as agg-then-join, but
    one shuffle instead of two and no per-call aggregator/join actor
    startup (measured 9s -> 2.8s at sf0.1/32 cpus on Ray 2.49)."""
    nparts = agg_partitions()

    def li_side(t: pa.Table) -> pd.DataFrame:
        r = pc.multiply(pc.cast(t["l_extendedprice"], pa.float64()),
                        pc.subtract(pa.scalar(1.0), pc.cast(t["l_discount"], pa.float64())))
        key = t["l_orderkey"].to_numpy(zero_copy_only=False)
        # within-batch combiner: pre-sum per key before the shuffle
        df = pd.DataFrame({"o_orderkey": key,
                           "rev_c": cents_arrow(r).to_numpy(zero_copy_only=False)})
        df = df.groupby("o_orderkey", sort=False, as_index=False)["rev_c"].sum()
        df["tot_c"] = np.int64(0)
        df["side"] = np.int8(0)
        df["part"] = (df["o_orderkey"].to_numpy().astype(np.uint64)
                      % np.uint64(nparts)).astype(np.int32)
        return df

    def o_side(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "o_orderkey": t["o_orderkey"].to_numpy(zero_copy_only=False),
            "rev_c": np.int64(0),
            "tot_c": cents_arrow(t["o_totalprice"]).to_numpy(zero_copy_only=False)})
        df["side"] = np.int8(1)
        df["part"] = (df["o_orderkey"].to_numpy().astype(np.uint64)
                      % np.uint64(nparts)).astype(np.int32)
        return df

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        li_g = g[g["side"] == 0]
        o_g = g[g["side"] == 1]
        rev = li_g.groupby("o_orderkey", sort=False, as_index=False)["rev_c"].sum()
        out = rev.merge(o_g[["o_orderkey", "tot_c"]], on="o_orderkey",
                        how="inner")
        return out[out["rev_c"] > out["tot_c"]]

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"]) \
        .map_batches(li_side, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]) \
        .map_batches(o_side, batch_format="pyarrow", zero_copy_batch=True)
    return exchange_map_groups(li.union(orders), "part", nparts, merge_part)


# -- 3-way join + equality filter + agg + sort (Amex-analogue) -------------

def urgent_orders_by_nation(sf_dir: str) -> pd.DataFrame:
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderstatus",
                                      "o_totalprice", "o_orderpriority"])
    def urgent(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
        return pa.table({"o_custkey": t["o_custkey"],
                         "tot_c": cents_arrow(t["o_totalprice"])})

    orders = orders.map_batches(urgent, batch_format="pyarrow", zero_copy_batch=True)
    # nation is a FIXED dim (25 rows) -> always broadcast onto customer;
    # customer is sf-PROPORTIONAL -> the size-gated chooser broadcasts
    # it while it fits and switches to the partitioned hash join beyond
    # the threshold (it stops being a 'small side' at scale)
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    cust = broadcast_join(_read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
                          nation, on="c_nationkey", right_on="n_nationkey")
    cust = cust.select_columns(["c_custkey", "n_name"])
    j = auto_join(orders, cust, on="o_custkey", right_on="c_custkey",
                  num_partitions=join_partitions())
    agg = small_groupby(j, "n_name", {"n_orders": ("tot_c", "count"),
                                      "sum_tot_c": ("tot_c", "sum")})
    return agg.sort_values(["n_orders", "n_name"], ascending=[False, True],
                           ignore_index=True)


# -- date-window filter + group-avg + join dim + sort desc (Top30 analogue)

def _col_max(ds: ray.data.Dataset, col: str):
    """Global max via per-batch partials (one row per batch to the
    driver) -- avoids spinning a full shuffle-aggregate for a scalar.
    None for an empty dataset or an all-null column (SQL MAX)."""
    parts = ds.map_batches(
        lambda t: pa.table({col: [pc.max(t[col]).as_py()]}),
        batch_format="pyarrow").take_all()
    vals = [r[col] for r in parts if r[col] is not None]
    return max(vals) if vals else None


def _parquet_col_max(path: str, col: str):
    """Column max straight from parquet row-group statistics -- zero
    data bytes read. Returns None when any row group lacks min/max
    stats (caller falls back to a scan)."""
    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
    vals = []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None
        vals.append(st.max)
    return max(vals) if vals else None


def top_segments_last7d(sf_dir: str) -> pd.DataFrame:
    ev = _read(sf_dir, "events", ["user_id", "value", "ts"])
    # deterministic window bound from the data: footer statistics spare
    # the extra full scan the per-batch max would cost
    hi = _parquet_col_max(os.path.join(sf_dir, "events.parquet"), "ts")
    if hi is None:
        hi = _col_max(ev, "ts")
    if hi is None:     # empty / all-null ts: no window, typed empty
        return pd.DataFrame({
            "c_mktsegment": pd.Series(dtype="object"),
            "n_events": pd.Series(dtype="int64"),
            "sum_value_c": pd.Series(dtype="int64"),
            "avg_value": pd.Series(dtype="float64")})
    lo = hi - pd.Timedelta(days=7)

    def in_window(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater(t["ts"], pa.scalar(lo)),
                    pc.less_equal(t["ts"], pa.scalar(hi)))
        t = t.filter(m)
        return pa.table({"user_id": t["user_id"], "value_c": cents_arrow(t["value"])})

    ev = ev.map_batches(in_window, batch_format="pyarrow", zero_copy_batch=True)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    # customer is sf-proportional: size-gated broadcast-vs-partitioned
    j = auto_join(ev, cust, on="user_id", right_on="c_custkey",
                  num_partitions=join_partitions())
    agg = small_groupby(j, "c_mktsegment", {
        "n_events": ("value_c", "count"), "sum_value_c": ("value_c", "sum")})
    agg["avg_value"] = (agg["sum_value_c"].astype("float64") / 100.0) \
        / agg["n_events"].astype("float64")
    return agg.sort_values(["n_events", "c_mktsegment"],
                           ascending=[False, True], ignore_index=True)


# -- expression join on derived string key (SampleStream J6) ---------------

def derived_key_join(sf_dir: str) -> pd.DataFrame:
    def last_char_key(col: "pa.ChunkedArray") -> pa.Array:
        # SampleStream J6 parity: equi-join on a substring-of-upper
        # derived key (here: the trailing character of the name)
        return pc.utf8_upper(
            pc.struct_field(pc.extract_regex(col, r"(?P<c>.)$"), "c"))

    cust = _read(sf_dir, "customer", ["c_name"]).map_batches(
        lambda t: pa.table({"k": last_char_key(t["c_name"])}),
        batch_format="pyarrow", zero_copy_batch=True)
    nation = _read(sf_dir, "nation", ["n_name"]).map_batches(
        lambda t: pa.table({"k": last_char_key(t["n_name"]),
                            "n_name": t["n_name"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    j = broadcast_join(cust, nation, on="k")
    agg = small_groupby(j, "k", {"n_pairs": ("k", "count")})
    return agg.sort_values("k", ignore_index=True)


# -- contains/startswith filters + dedup-by-key (SampleCrud) ---------------

def crud_filter_dedup(sf_dir: str) -> pd.DataFrame:
    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_brand", "p_type"])

    def flt(t: pa.Table) -> pa.Table:
        m = pc.or_(pc.match_substring(t["p_type"], "ECONOMY"),
                   pc.match_substring(t["p_type"], "SMALL"))
        m = pc.and_(m, pc.starts_with(pc.utf8_lower(t["p_name"]), "b"))
        t = t.filter(m)
        return t.select(["p_brand", "p_partkey"])

    pre = part.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)
    agg = small_groupby(pre, "p_brand", {"p_partkey": ("p_partkey", "min")})
    return agg.sort_values("p_brand", ignore_index=True)


# -- union with source tag (O2/T4) -----------------------------------------

def union_tag(sf_dir: str) -> ray.data.Dataset:
    region = _read(sf_dir, "region", ["r_name"]).map_batches(
        lambda t: pa.table({"src": pa.array(["region"] * t.num_rows),
                            "name": t["r_name"]}), batch_format="pyarrow")
    nation = _read(sf_dir, "nation", ["n_name"]).map_batches(
        lambda t: pa.table({"src": pa.array(["nation"] * t.num_rows),
                            "name": t["n_name"]}), batch_format="pyarrow")
    return region.union(nation)


# -- tumbling window aggregate over the event stream -----------------------

def events_tumbling_window(sf_dir: str) -> pd.DataFrame:
    ev = _read(sf_dir, "events", ["event_type", "value", "ts"])

    def bucketize(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table({"event_type": t["event_type"], "hour": hour,
                         "value_c": cents_arrow(t["value"])})

    pre = ev.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
    agg = small_groupby(pre, ["event_type", "hour"], {
        "n": ("value_c", "count"), "sum_value_c": ("value_c", "sum")})
    agg["hour"] = agg["hour"].astype("datetime64[us]")
    return agg.sort_values(["event_type", "hour"], ignore_index=True)


# -- sessionization: per-key ordered, gap-based windows --------------------

def events_sessionize(sf_dir: str, gap_minutes: int = 30) -> ray.data.Dataset:
    """Gap-based session counts per user. ALL of a partition's users
    sessionize in ONE vectorized pandas call (sort by (user, ts), diff,
    user-boundary reset) -- one Python call per PARTITION, not per user
    (per-user map_groups means millions of interpreter calls at real
    user counts)."""
    nparts = agg_partitions()
    gap = pd.Timedelta(minutes=gap_minutes)

    def route(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_id": t["event_id"].to_numpy(zero_copy_only=False),
            "ts": t["ts"].to_pandas().astype("datetime64[us]")})
        df["part"] = (df["user_id"].to_numpy().astype(np.uint64)
                      % np.uint64(nparts)).astype(np.int32)
        return df

    def sessions_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable",
                          ignore_index=True)
        boundary = g["user_id"].ne(g["user_id"].shift())
        new_s = boundary | (g["ts"].diff() > gap)
        out = g.assign(ns=new_s).groupby("user_id", sort=False,
                                         as_index=False) \
               .agg(n_sessions=("ns", "sum"), n_events=("ns", "size"))
        out["n_sessions"] = out["n_sessions"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    routed = ev.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
    return exchange_map_groups(routed, "part", nparts, sessions_part)


# -- semi join: events of customers who placed an urgent order -------------

def events_semi_join(sf_dir: str) -> pd.DataFrame:
    """Size-gated semi join: the urgent-customer key set is MEASURED
    (auto_semi_join); under the broadcast threshold it ships once as an
    exact set, beyond it the Bloom-summary + exact-de-FP path engages
    automatically (the key set is sf-proportional, so at 100 TB the
    Bloom path is the live one)."""
    from ..stages.joins import auto_semi_join

    urgent = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
        return t.select(["o_custkey"])

    urgent_keys = urgent.map_batches(keys, batch_format="pyarrow",
                                     zero_copy_batch=True)
    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    j = auto_semi_join(ev, urgent_keys, on="user_id", right_on="o_custkey")
    agg = small_groupby(j, "event_type", {"n": ("user_id", "count")})
    return agg.sort_values("event_type", ignore_index=True)


# -- top-k with limit (O4) -------------------------------------------------

def top10_expensive_orders(sf_dir: str) -> ray.data.Dataset:
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    orders = orders.map_batches(
        lambda t: pa.table({"o_orderkey": t["o_orderkey"],
                            "tot_c": cents_arrow(t["o_totalprice"])}),
        batch_format="pyarrow", zero_copy_batch=True)
    return orders.sort(["tot_c", "o_orderkey"], descending=[True, False]).limit(10)


# -- semi-structured JSON projection (parse_json / T1+T3) ------------------

def props_json_extract(sf_dir: str) -> pd.DataFrame:
    ev = _read(sf_dir, "events", ["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        # props = '{"k": <int>}': vectorized parse of the numeric field
        k = pc.cast(pc.struct_field(pc.extract_regex(t["props"], r"(?P<k>[0-9]+)"), "k"),
                    pa.int64())
        return pa.table({"event_type": t["event_type"], "k": k})

    pre = ev.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)
    agg = small_groupby(pre, "event_type", {
        "n": ("k", "count"), "sum_k": ("k", "sum"), "max_k": ("k", "max")})
    return agg.sort_values("event_type", ignore_index=True)


# -- hopping (sliding) window aggregate ------------------------------------

def events_hopping_window(sf_dir: str, size_min: int = 60,
                          hop_min: int = 30) -> pd.DataFrame:
    """Overlapping (hopping) windows: every event lands in size/hop
    windows, emitted vectorized as size/hop shifted copies of the
    floor-to-hop bucket, then the bounded-cardinality window aggregate
    (§2.8 sliding-window extension of events_tumbling_window)."""
    assert size_min % hop_min == 0
    k = size_min // hop_min
    ev = _read(sf_dir, "events", ["event_type", "value", "ts"])

    def expand(t: pa.Table) -> pa.Table:
        base = pc.floor_temporal(t["ts"], multiple=hop_min, unit="minute")
        parts = []
        for i in range(k):
            ws = pc.subtract(base, pa.scalar(pd.Timedelta(minutes=i * hop_min)))
            parts.append(pa.table({
                "window_start": pc.cast(ws, pa.timestamp("us")),
                "event_type": t["event_type"],
                "value_c": cents_arrow(t["value"]),
            }))
        return pa.concat_tables(parts)

    pre = ev.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
    agg = small_groupby(pre, ["window_start", "event_type"], {
        "n": ("value_c", "count"), "sum_value_c": ("value_c", "sum")})
    agg["window_start"] = agg["window_start"].astype("datetime64[us]")
    return agg.sort_values(["window_start", "event_type"], ignore_index=True)


# -- exact distributed COUNT(DISTINCT) -------------------------------------

def events_distinct_users(sf_dir: str, num_partitions: int = 16) -> pd.DataFrame:
    """Exact distinct-user count per event type, distributed: rows
    hash-route by user_id (each user lands wholly in one partition), a
    per-partition vectorized drop_duplicates counts its users once, and
    the per-partition counts sum on the driver (n_types x n_partitions
    rows). No global shuffle of raw rows beyond the routed exchange; no
    driver-side distinct."""
    ev = _read(sf_dir, "events", ["event_type", "user_id"])

    def route(t: pa.Table) -> pd.DataFrame:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                           "user_id": uid})
        # within-batch combiner: distinct before the exchange
        df = df.drop_duplicates(ignore_index=True)
        df["part"] = (df["user_id"].to_numpy().astype(np.uint64)
                      % np.uint64(num_partitions)).astype(np.int32)
        return df

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["event_type", "user_id"])
        out = d.groupby("event_type", sort=False, as_index=False).size()
        return out.rename(columns={"size": "n_users"})

    routed = ev.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
    parts = exchange_map_groups(routed, "part", num_partitions,
                                count_part).to_pandas()
    out = parts.groupby("event_type", sort=False, as_index=False)["n_users"].sum()
    return out.sort_values("event_type", ignore_index=True)


# -- as-of join: event -> latest order at-or-before its timestamp ----------

def events_asof_latest_order(sf_dir: str) -> ray.data.Dataset:
    """Distributed AS-OF join (temporal nearest-<= match), the lookup a
    CDC/feature pipeline does constantly: for each event, the user's
    most recent order as of the event time (ties on order date broken
    by max o_orderkey -- fully deterministic).

    Plan: both sides hash-route by the join key into K coarse
    partitions (a user's events AND orders land wholly in one
    partition), then each partition runs ONE vectorized
    ``pd.merge_asof(by=user)`` -- no per-key Python loop, no global
    sort: ordering is established per-partition, which is the
    partitioning assumption this operator relies on (key-hash
    co-location; skew-safe because no single user exceeds a partition).
    """
    nparts = agg_partitions()

    def ev_side(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_id": t["event_id"].to_numpy(zero_copy_only=False),
            "ats": t["ts"].to_pandas().astype("datetime64[us]")})
        df["o_orderkey"] = np.int64(0)
        df["side"] = np.int8(0)
        df["part"] = (df["user_id"].to_numpy().astype(np.uint64)
                      % np.uint64(nparts)).astype(np.int32)
        return df

    def o_side(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "user_id": t["o_custkey"].to_numpy(zero_copy_only=False),
            "event_id": np.int64(0),
            "ats": t["o_orderdate"].to_pandas().astype("datetime64[us]"),
            "o_orderkey": t["o_orderkey"].to_numpy(zero_copy_only=False)})
        df["side"] = np.int8(1)
        df["part"] = (df["user_id"].to_numpy().astype(np.uint64)
                      % np.uint64(nparts)).astype(np.int32)
        return df

    def asof_part(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0].sort_values("ats", kind="stable")
        # sorted by (ats, o_orderkey): merge_asof(backward) takes the
        # LAST positional row <= ats => max orderkey of the max date
        right = g[g["side"] == 1].sort_values(["ats", "o_orderkey"],
                                              kind="stable")
        if left.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "o_orderkey": pd.Series(dtype="int64")})
        m = pd.merge_asof(left[["user_id", "event_id", "ats"]],
                          right[["user_id", "ats", "o_orderkey"]],
                          on="ats", by="user_id", direction="backward")
        m = m[m["o_orderkey"].notna()]
        return pd.DataFrame({"event_id": m["event_id"],
                             "o_orderkey": m["o_orderkey"].astype("int64")})

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"]) \
        .map_batches(ev_side, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(o_side, batch_format="pyarrow", zero_copy_batch=True)
    return exchange_map_groups(ev.union(orders), "part", nparts,
                               asof_part).sort("event_id")


# -- top-k per group (the per-entity leaderboard shape) --------------------

def top_events_per_user(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Top-k events per user by value (ties -> lower event_id), without
    a global sort: each batch first prunes itself to <=k rows per user
    (within-batch combiner -- the exchange only ever carries candidate
    rows), the survivors hash-route by user, and each partition takes
    its exact per-user top-k vectorized."""
    nparts = agg_partitions()

    def prune(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_id": t["event_id"].to_numpy(zero_copy_only=False),
            "value_c": cents_arrow(t["value"]).to_numpy(zero_copy_only=False)})
        df = df.sort_values(["value_c", "event_id"],
                            ascending=[False, True], kind="stable")
        df = df.groupby("user_id", sort=False).head(k)
        df["part"] = (df["user_id"].to_numpy().astype(np.uint64)
                      % np.uint64(nparts)).astype(np.int32)
        return df

    def topk_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value_c", "event_id"],
                          ascending=[False, True], kind="stable")
        out = g.groupby("user_id", sort=False).head(k)
        return out[["user_id", "event_id", "value_c"]]

    ev = _read(sf_dir, "events", ["user_id", "event_id", "value"])
    routed = ev.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
    return exchange_map_groups(routed, "part", nparts, topk_part) \
        .sort(["user_id", "event_id"])


# -- exact distributed quantiles (discrete-domain histogram method) --------

_QUANTILE_PS = ((25, 0.25), (50, 0.5), (75, 0.75), (90, 0.9), (99, 0.99))


def value_quantiles(sf_dir: str) -> pd.DataFrame:
    """EXACT p25/p50/p75/p90/p99 of event value (cents) per event type,
    distributed by value-count histogram: each batch pre-counts its
    (type, value) pairs, counts hash-route by value and reduce per
    partition, and only the HISTOGRAM (one row per distinct (type,
    cents) pair) reaches the driver for the cumulative-count quantile
    selection. Exactness relies on the discrete bounded domain (money
    cents), which caps histogram size independently of row count -- the
    right trade for 100-TB exact quantiles; unbounded-domain quantiles
    should use a mergeable sketch (t-digest) instead and accept
    approximation. Selection index matches DuckDB quantile_disc:
    sorted[ceil(p*n) - 1]."""
    nparts = agg_partitions()
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "event_type": t["event_type"].to_pandas(),
            "value_c": cents_arrow(t["value"]).to_numpy(zero_copy_only=False)})
        out = df.groupby(["event_type", "value_c"], sort=False,
                         as_index=False).size().rename(columns={"size": "n"})
        out["part"] = (out["value_c"].to_numpy().astype(np.uint64)
                       % np.uint64(nparts)).astype(np.int32)
        return out

    def reduce_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "value_c"], sort=False,
                         as_index=False)["n"].sum()

    routed = ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    hist = exchange_map_groups(routed, "part", nparts, reduce_part).to_pandas()
    rows = []
    for etype, g in hist.groupby("event_type", sort=True):
        g = g.sort_values("value_c", ignore_index=True)
        cum = g["n"].cumsum().to_numpy()
        n = int(cum[-1])
        for label, p in _QUANTILE_PS:
            idx = max(0, int(np.ceil(p * n)) - 1)
            pos = int(np.searchsorted(cum, idx + 1, side="left"))
            rows.append({"event_type": etype, "p": f"p{label}",
                         "q_value_c": int(g["value_c"].iloc[pos])})
    return pd.DataFrame(rows)


# -- left join: keep unmatched left rows (zero-activity entities) ----------

def customer_event_counts(sf_dir: str) -> pd.DataFrame:
    """LEFT join shape: every customer with their event count,
    INCLUDING zero-event customers (the rows an inner join silently
    drops -- the usual activity-report bug). Both sides are
    sf-proportional (per-user counts, customer table), so neither may
    be broadcast or reduced on the driver: both hash-route by the user
    key into K coarse partitions (one exchange) and each partition does
    the count + LEFT merge + per-segment partial in one vectorized
    pandas call. Only n_segments x K partial rows reach the driver.
    Output: per market segment, total customers and how many of them
    have zero events."""
    nparts = agg_partitions()

    def ev_side(t: pa.Table) -> pd.DataFrame:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        # within-batch combiner: pre-count per user before the shuffle
        df = pd.DataFrame({"uid": uid}).groupby(
            "uid", sort=False, as_index=False).size() \
            .rename(columns={"size": "n_ev"})
        df["side"] = np.int8(0)
        df["part"] = (df["uid"].to_numpy().astype(np.uint64)
                      % np.uint64(nparts)).astype(np.int32)
        return df

    def cust_side(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "uid": t["c_custkey"].to_numpy(zero_copy_only=False),
            "seg": t["c_mktsegment"].to_numpy(zero_copy_only=False)})
        df["n_ev"] = np.int64(0)
        df["side"] = np.int8(1)
        df["part"] = (df["uid"].to_numpy().astype(np.uint64)
                      % np.uint64(nparts)).astype(np.int32)
        return df

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        counts = g[g["side"] == 0].groupby(
            "uid", sort=False, as_index=False)["n_ev"].sum()
        cust = g.loc[g["side"] == 1, ["uid", "seg"]]
        m = cust.merge(counts, on="uid", how="left")
        zero = m["n_ev"].isna().astype("int64")
        return m.assign(zero=zero).groupby(
            "seg", sort=False, as_index=False).agg(
            n_customers=("zero", "size"), n_zero_event=("zero", "sum"))

    ev = _read(sf_dir, "events", ["user_id"]) \
        .map_batches(ev_side, batch_format="pyarrow", zero_copy_batch=True)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .map_batches(cust_side, batch_format="pyarrow", zero_copy_batch=True)
    parts = exchange_map_groups(ev.union(cust), "part", nparts,
                                merge_part).to_pandas()
    out = parts.groupby("seg", sort=True, as_index=False).agg(
        n_customers=("n_customers", "sum"), n_zero_event=("n_zero_event", "sum"))
    out = out.rename(columns={"seg": "c_mktsegment"})
    return out.sort_values("c_mktsegment", ignore_index=True)


# -- rollup: hierarchical subtotals over bounded dimension keys ------------

def orders_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP (status, priority): detail rows + per-status
    subtotals + grand total, NULL marking each rolled-up level. The
    distributed part is ONE pass of bounded-cardinality partials
    (<= 15 detail groups per batch, exact cents); every coarser level
    is a driver-side re-sum of those 15 rows -- rollups over bounded
    dims never need a second scan or shuffle."""
    orders = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority",
                                      "o_totalprice"])

    def pre(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderstatus": t["o_orderstatus"].to_numpy(zero_copy_only=False),
            "o_orderpriority": t["o_orderpriority"].to_numpy(zero_copy_only=False),
            "tot_c": cents_arrow(t["o_totalprice"]).to_numpy(zero_copy_only=False)})

    detail = small_groupby(
        orders.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True),
        ["o_orderstatus", "o_orderpriority"],
        {"n_orders": ("tot_c", "count"), "sum_total_c": ("tot_c", "sum")})
    per_status = detail.groupby("o_orderstatus", as_index=False).agg(
        n_orders=("n_orders", "sum"), sum_total_c=("sum_total_c", "sum"))
    per_status["o_orderpriority"] = None
    grand = pd.DataFrame([{
        "o_orderstatus": None, "o_orderpriority": None,
        "n_orders": detail["n_orders"].sum(),
        "sum_total_c": detail["sum_total_c"].sum()}])
    out = pd.concat([detail, per_status, grand], ignore_index=True)
    out = out[["o_orderstatus", "o_orderpriority", "n_orders", "sum_total_c"]]
    out["n_orders"] = out["n_orders"].astype("int64")
    out["sum_total_c"] = out["sum_total_c"].astype("int64")
    return out.sort_values(["o_orderstatus", "o_orderpriority"],
                           na_position="first", ignore_index=True)


# -- pivot: event counts per type across weekday columns -------------------

def events_weekday_pivot(sf_dir: str) -> pd.DataFrame:
    """Pivot (conditional aggregation) -- long (type, weekday) counts
    reshaped to one fixed wide row per type. The aggregate is the
    bounded-cardinality combiner shape; the reshape is a driver-side
    pandas pivot over n_types x 7 rows."""
    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def derive(t: pa.Table) -> pd.DataFrame:
        ts = t["ts"].to_pandas()
        return pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                             "dow": ts.dt.dayofweek.astype("int64")})

    pre = ev.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    agg = small_groupby(pre, ["event_type", "dow"], {"n": ("dow", "count")})
    wide = agg.pivot_table(index="event_type", columns="dow", values="n",
                           fill_value=0, aggfunc="sum")
    wide = wide.reindex(columns=range(7), fill_value=0)
    wide.columns = [f"n_d{d}" for d in range(7)]
    out = wide.reset_index().sort_values("event_type", ignore_index=True)
    return out.astype({c: "int64" for c in out.columns if c != "event_type"})


# -- per-key ordered window: running total (cumsum / lag family) -----------

def user_running_total(sf_dir: str) -> ray.data.Dataset:
    """Cumulative value per user in event-time order (the per-entity
    ordered-window shape: cumsum, lag, lead, diff all reduce to it).
    No global sort: rows hash-route by user, each partition sorts ONLY
    its own users' rows and computes every user's cumsum in one
    vectorized pandas groupby-cumsum call."""
    nparts = agg_partitions()

    def route(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_id": t["event_id"].to_numpy(zero_copy_only=False),
            "value_c": cents_arrow(t["value"]).to_numpy(zero_copy_only=False)})
        df["part"] = (df["user_id"].to_numpy().astype(np.uint64)
                      % np.uint64(nparts)).astype(np.int32)
        return df

    def window_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", ignore_index=True)
        g["running_c"] = g.groupby("user_id", sort=False)["value_c"].cumsum()
        return g[["user_id", "event_id", "value_c", "running_c"]]

    ev = _read(sf_dir, "events", ["user_id", "event_id", "value"])
    routed = ev.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
    return exchange_map_groups(routed, "part", nparts, window_part) \
        .sort("event_id")


# -- funnel: ordered step-sequence match per user ---------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def events_funnel(sf_dir: str, steps: tuple = FUNNEL_STEPS) -> pd.DataFrame:
    """Funnel analysis: how many users have a view -> click -> purchase
    SUBSEQUENCE (each step strictly after the previous, ties broken by
    event_id). Vectorized by iterating over STEPS, not rows: per
    partition, step k is one groupby-first of k's candidate events
    after the user's step-(k-1) anchor -- len(steps) vectorized passes,
    no per-user Python. Users are hash-co-located so anchors never
    cross partitions; per-partition step counts sum on the driver
    (len(steps) x P rows)."""
    nparts = agg_partitions()

    def route(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_id": t["event_id"].to_numpy(zero_copy_only=False),
            "event_type": t["event_type"].to_pandas(),
            "ts": t["ts"].to_pandas().astype("datetime64[us]")})
        df = df[df["event_type"].isin(steps)]
        df["part"] = (df["user_id"].to_numpy().astype(np.uint64)
                      % np.uint64(nparts)).astype(np.int32)
        return df

    def funnel_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable",
                          ignore_index=True)
        anchor = None        # per-user (ts, event_id) of the last step hit
        counts = []
        for step in steps:
            cand = g[g["event_type"] == step]
            if anchor is not None:
                cand = cand.merge(anchor, on="user_id", how="inner")
                after = (cand["ts"] > cand["a_ts"]) | (
                    (cand["ts"] == cand["a_ts"])
                    & (cand["event_id"] > cand["a_eid"]))
                cand = cand[after]
            first = cand.groupby("user_id", sort=False).head(1)
            anchor = pd.DataFrame({"user_id": first["user_id"],
                                   "a_ts": first["ts"],
                                   "a_eid": first["event_id"]})
            counts.append(len(first))
        return pd.DataFrame({"step": np.arange(1, len(steps) + 1,
                                               dtype=np.int64),
                             "n_users": np.asarray(counts, dtype=np.int64)})

    ev = _read(sf_dir, "events", ["user_id", "event_id", "event_type", "ts"])
    routed = ev.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
    parts = exchange_map_groups(routed, "part", nparts,
                                funnel_part).to_pandas()
    out = parts.groupby("step", sort=True, as_index=False)["n_users"].sum()
    return out.sort_values("step", ignore_index=True)


# -- interval (time-window) join --------------------------------------------

def events_window_join(sf_dir: str, window_hours: int = 24) -> pd.DataFrame:
    """Stream-stream INTERVAL join (attribution): pairs of (view,
    purchase) by the same user with the purchase inside
    [view.ts, view.ts + window) -- the windowed-join shape of streaming
    engines (as-of join is its nearest-1 specialization). Both event
    roles hash-co-locate by user; each partition joins equi-key first
    (user) then applies the interval predicate vectorized, so the pair
    blowup is bounded per user per window, never global.
    Output: per user, the number of attributed (view, purchase) pairs."""
    nparts = agg_partitions()
    win = pd.Timedelta(hours=window_hours)

    def route(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_type": t["event_type"].to_pandas(),
            "ats": t["ts"].to_pandas().astype("datetime64[us]")})
        df = df[df["event_type"].isin(("view", "purchase"))]
        df["part"] = (df["user_id"].to_numpy().astype(np.uint64)
                      % np.uint64(nparts)).astype(np.int32)
        return df

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        views = g[g["event_type"] == "view"]
        buys = g[g["event_type"] == "purchase"]
        m = views.merge(buys[["user_id", "ats"]], on="user_id",
                        suffixes=("", "_p"))
        hit = (m["ats_p"] >= m["ats"]) & (m["ats_p"] < m["ats"] + win)
        out = m.loc[hit].groupby("user_id", sort=False,
                                 as_index=False).size()
        return out.rename(columns={"size": "n_pairs"})

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    routed = ev.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
    parts = exchange_map_groups(routed, "part", nparts,
                                join_part).to_pandas()
    return parts.sort_values("user_id", ignore_index=True)


# -- retention cohorts: weekly cohort x activity-week distinct users -------

def events_retention(sf_dir: str) -> pd.DataFrame:
    """Cohort retention matrix: users grouped by their FIRST-event week
    (the cohort), counted distinct per weeks-elapsed-since-cohort.
    One exchange: users hash-co-locate, each partition derives its
    users' cohorts and their distinct (cohort, weeks_since) activity in
    one vectorized pass -- per-user distinct never crosses partitions,
    so the partial counts sum exactly on the driver (bounded
    cohort x offset cells)."""
    nparts = agg_partitions()

    def route(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "ts": t["ts"].to_pandas().astype("datetime64[us]")})
        df["part"] = (df["user_id"].to_numpy().astype(np.uint64)
                      % np.uint64(nparts)).astype(np.int32)
        return df

    def cohort_part(g: pd.DataFrame) -> pd.DataFrame:
        # ISO-week-start (Monday) bucketing, vectorized
        week = (g["ts"] - pd.to_timedelta(
            g["ts"].dt.dayofweek, unit="D")).dt.normalize()
        g = pd.DataFrame({"user_id": g["user_id"], "week": week})
        first = g.groupby("user_id", sort=False)["week"].transform("min")
        g["cohort_week"] = first
        g["weeks_since"] = ((g["week"] - first).dt.days // 7).astype("int64")
        d = g[["user_id", "cohort_week", "weeks_since"]].drop_duplicates()
        out = d.groupby(["cohort_week", "weeks_since"], sort=False,
                        as_index=False).size()
        return out.rename(columns={"size": "n_users"})

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    routed = ev.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
    parts = exchange_map_groups(routed, "part", nparts,
                                cohort_part).to_pandas()
    out = parts.groupby(["cohort_week", "weeks_since"], sort=True,
                        as_index=False)["n_users"].sum()
    out["cohort_week"] = out["cohort_week"].astype("datetime64[us]")
    return out.sort_values(["cohort_week", "weeks_since"],
                           ignore_index=True)


# -- anti join: events of users who never placed an urgent order -----------

def events_anti_join(sf_dir: str) -> pd.DataFrame:
    """Size-gated ANTI join (complement of events_semi_join): under the
    threshold the exact key set broadcasts and batches drop members in
    place; beyond it bloom_semi_join(anti=True) engages -- Bloom-negative
    rows are provably non-members and stream straight through, only
    Bloom-positives transit the exchange for the exact membership drop
    (a Bloom alone can't do anti: a false positive would wrongly drop a
    row; the exact pass makes it exact)."""
    from ..stages.joins import auto_semi_join

    urgent = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
        return t.select(["o_custkey"])

    urgent_keys = urgent.map_batches(keys, batch_format="pyarrow",
                                     zero_copy_batch=True)
    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    j = auto_semi_join(ev, urgent_keys, on="user_id", right_on="o_custkey",
                       anti=True)
    agg = small_groupby(j, "event_type", {"n": ("user_id", "count")})
    return agg.sort_values("event_type", ignore_index=True)


# -- grouped ordered string-agg: per-user event-type journey ----------------

def user_journeys(sf_dir: str, max_steps: int = 20) -> ray.data.Dataset:
    """Per-user ordered event-type path ("view>click>purchase>..."),
    capped at the first `max_steps` events in (ts, event_id) order --
    the grouped ordered string-agg shape used to render per-entity
    histories (and, on the transcript table, training examples; see
    cdc_render_transcripts for that variant). No global sort: each
    batch first prunes itself to its own first-`max_steps` rows per
    user (the global first-K of a user is a subset of the union of
    per-batch first-Ks, so the exchange only carries candidates), the
    survivors hash-route by user, and each partition takes the exact
    first-K and renders every user's path in one pandas string-agg
    pass (C-level join per group)."""
    nparts = agg_partitions()

    def prune(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_id": t["event_id"].to_numpy(zero_copy_only=False),
            "event_type": t["event_type"].to_pandas(),
            "ts": t["ts"].to_pandas().astype("datetime64[us]")})
        df = df.sort_values(["ts", "event_id"], kind="stable")
        df = df.groupby("user_id", sort=False).head(max_steps)
        df["part"] = (df["user_id"].to_numpy().astype(np.uint64)
                      % np.uint64(nparts)).astype(np.int32)
        return df

    def render_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        g = g.groupby("user_id", sort=False).head(max_steps)
        out = g.groupby("user_id", sort=False).agg(
            n_steps=("event_type", "size"),
            journey=("event_type", ">".join)).reset_index()
        out["n_steps"] = out["n_steps"].astype("int64")
        return out[["user_id", "n_steps", "journey"]]

    ev = _read(sf_dir, "events", ["user_id", "event_id", "event_type", "ts"])
    routed = ev.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
    return exchange_map_groups(routed, "part", nparts, render_part) \
        .sort("user_id")


# -- rolling window per key: moving sum over the last w events --------------

def user_moving_sum(sf_dir: str, window: int = 3) -> ray.data.Dataset:
    """Per-user moving sum of value over the trailing `window` events in
    (ts, event_id) order (ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW) --
    the bounded-lookback window family (moving avg/min/max reduce to
    it). Same single exchange as the running total; inside a partition
    the window is pure numpy: one global cumsum, trailing difference
    against position-(i-w) guarded by each user's segment start, no
    per-group pandas rolling loop."""
    nparts = agg_partitions()

    def route(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_id": t["event_id"].to_numpy(zero_copy_only=False),
            "value_c": cents_arrow(t["value"]).to_numpy(zero_copy_only=False),
            "ts": t["ts"].to_pandas().astype("datetime64[us]")})
        df["part"] = (df["user_id"].to_numpy().astype(np.uint64)
                      % np.uint64(nparts)).astype(np.int32)
        return df

    def window_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable",
                          ignore_index=True)
        val = g["value_c"].to_numpy()
        uid = g["user_id"].to_numpy()
        # SQL window SUM ignores NULLs; a raw cumsum would instead
        # NaN-poison every later row in the partition (other users
        # included). Zero-fill nulls for the sum and track the valid
        # count so an all-null window still yields NULL, not 0.
        nullable = val.dtype.kind == "f" and bool(np.isnan(val).any())
        if nullable:
            valid = ~np.isnan(val)
            val = np.where(valid, val, 0.0)
        cum = np.cumsum(val)
        # index of each row's user-segment start
        starts = np.zeros(len(g), dtype=np.int64)
        new_seg = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        starts[new_seg] = new_seg
        starts = np.maximum.accumulate(starts)
        pos = np.arange(len(g)) - starts
        idx = np.arange(len(g)) - window

        def trailing(c: np.ndarray) -> np.ndarray:
            base = np.where(pos >= window,
                            c[np.maximum(idx, 0)],
                            np.where(starts > 0,
                                     c[np.maximum(starts - 1, 0)], 0))
            base[(pos < window) & (starts == 0)] = 0
            return c - base

        moving = trailing(cum)
        if nullable:
            n_valid = trailing(np.cumsum(valid.astype(np.int64)))
            moving = np.where(n_valid > 0, moving, np.nan)
        g["moving_c"] = moving
        return g[["user_id", "event_id", "moving_c"]]

    ev = _read(sf_dir, "events", ["user_id", "event_id", "value", "ts"])
    routed = ev.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
    return exchange_map_groups(routed, "part", nparts, window_part) \
        .sort("event_id")


# -- full outer join: union of matched + both unmatched sides ---------------

def nation_customer_supplier_counts(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER join of per-nation deep-debit customer counts
    (c_acctbal < -900) with negative-balance supplier counts
    (s_acctbal < 0): nations with only such customers, only such
    suppliers, or both all appear (missing side = 0; the asymmetric
    filters make all three cases non-empty at sf0.01). Both sides
    pre-aggregate inside their own batches (bounded nation
    cardinality), so the exchange carries partials; each partition
    outer-merges its nations. Closes the join-shape family
    (inner/left/semi/anti/asof/interval already covered)."""
    nparts = 4

    def cust_side(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.less(t["c_acctbal"], -900.0))
        df = pd.DataFrame({"nk": t["c_nationkey"].to_numpy(zero_copy_only=False)})
        out = df.groupby("nk", as_index=False).size() \
            .rename(columns={"size": "n_cust"})
        out["n_supp"] = np.int64(0)
        out["part"] = (out["nk"].to_numpy().astype(np.uint64)
                       % np.uint64(nparts)).astype(np.int32)
        return out

    def supp_side(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.less(t["s_acctbal"], 0.0))
        df = pd.DataFrame({"nk": t["s_nationkey"].to_numpy(zero_copy_only=False)})
        out = df.groupby("nk", as_index=False).size() \
            .rename(columns={"size": "n_supp"})
        out["n_cust"] = np.int64(0)
        out["part"] = (out["nk"].to_numpy().astype(np.uint64)
                       % np.uint64(nparts)).astype(np.int32)
        return out

    def outer_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("nk", as_index=False).agg(
            n_cust=("n_cust", "sum"), n_supp=("n_supp", "sum"))

    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"]) \
        .map_batches(cust_side, batch_format="pyarrow", zero_copy_batch=True)
    supp = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"]) \
        .map_batches(supp_side, batch_format="pyarrow", zero_copy_batch=True)
    parts = exchange_map_groups(cust.union(supp), "part", nparts,
                                outer_part).to_pandas()
    out = parts.groupby("nk", as_index=False).agg(
        n_cust=("n_cust", "sum"), n_supp=("n_supp", "sum"))
    out = out.rename(columns={"nk": "n_nationkey"})
    out = out.astype({"n_cust": "int64", "n_supp": "int64",
                      "n_nationkey": "int64"})
    return out.sort_values("n_nationkey", ignore_index=True)


# -- set ops: INTERSECT / EXCEPT over distributed key sets ------------------

def users_view_purchase_setops(sf_dir: str) -> pd.DataFrame:
    """INTERSECT / EXCEPT (the set-op family the reference lacks): how
    many users viewed AND purchased, viewed only, purchased only.
    Each batch reduces to its distinct (user, which-side-bits), one
    exchange co-locates users, each partition ORs its users' bitmasks
    -- counts come from the bit patterns, only 3 numbers per partition
    reach the driver."""
    nparts = agg_partitions()

    def route(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_type": t["event_type"].to_pandas()})
        df = df[df["event_type"].isin(("view", "purchase"))]
        df["v"] = df["event_type"] == "view"
        df["p"] = ~df["v"]
        out = df.groupby("user_id", as_index=False).agg(
            v=("v", "max"), p=("p", "max"))
        out["part"] = (out["user_id"].to_numpy().astype(np.uint64)
                       % np.uint64(nparts)).astype(np.int32)
        return out

    def setop_part(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("user_id", sort=False).agg(v=("v", "max"),
                                                 p=("p", "max"))
        v, p = m["v"].to_numpy(), m["p"].to_numpy()
        return pd.DataFrame({
            "set_op": ["both", "purchase_only", "view_only"],
            "n_users": np.array([(v & p).sum(), (p & ~v).sum(),
                                 (v & ~p).sum()], dtype=np.int64)})

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    routed = ev.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
    parts = exchange_map_groups(routed, "part", nparts,
                                setop_part).to_pandas()
    out = parts.groupby("set_op", as_index=False)["n_users"].sum()
    return out.sort_values("set_op", ignore_index=True)
