"""Table profiling (ANALYZE TABLE): per-column stats in one pass.

Emits long-form rows (col, stat, value) with every value an int64:
row count, null count, exact distinct count, and min/max for integer
columns. Shapes:

  * count/nulls/min/max: per-batch partials (a handful of rows each)
    merged on the driver -- bounded by n_cols, corpus-independent;
  * exact distinct: per batch, each column's values dedupe locally and
    hash to 64-bit (only (col_id, hash) pairs leave the batch), pairs
    hash-route so a value lives wholly in one partition, each partition
    counts its own uniques, and the per-partition counts sum -- the
    routed exact-distinct shape (no driver-side set, no value shipping).
    64-bit collisions undercount by ~n^2/2^65 -- zero in practice and
    the driver oracle will catch any actual miss.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.exchange import exchange_map_groups
from .textstats import md5_hash64_series

PROFILE_PARTITIONS = 16


def profile_table(sf_dir: str, table: str = "documents",
                  columns: list[str] | None = None) -> pd.DataFrame:
    from ..sources.tables import read_table
    # materialize once: the scalar and distinct passes both consume the
    # table; re-executing the parquet read would double the I/O
    ds = read_table(sf_dir, table, columns).materialize()
    names = ds.schema().names

    def scalar_partial(t: pa.Table) -> pd.DataFrame:
        # arrow-native stats: a pandas conversion turns a null-bearing
        # int64 batch into float64, which silently skipped min/max for
        # those batches (wrong extrema) -- arrow kernels are null-aware
        # and keep the declared type
        rows = []
        for c in names:
            col = t[c]
            rows.append({"col": c, "stat": "count",
                         "value": np.int64(len(col))})
            rows.append({"col": c, "stat": "nulls",
                         "value": np.int64(col.null_count)})
            if pa.types.is_integer(col.type) and col.null_count < len(col):
                mm = pc.min_max(col)
                rows.append({"col": c, "stat": "min",
                             "value": np.int64(mm["min"].as_py())})
                rows.append({"col": c, "stat": "max",
                             "value": np.int64(mm["max"].as_py())})
        return pd.DataFrame(rows)

    scal = ds.map_batches(scalar_partial, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    merged = []
    for (c, st), g in scal.groupby(["col", "stat"], sort=False):
        v = {"count": g["value"].sum, "nulls": g["value"].sum,
             "min": g["value"].min, "max": g["value"].max}[st]()
        merged.append({"col": c, "stat": st, "value": int(v)})
    # an ALL-null integer column emits no min/max partial from any
    # batch, but SQL MIN/MAX always emit a (NULL-valued) row -- align
    # by appending null min/max rows for integer columns that produced
    # no extrema (the value column is nullable-int for exactly this)
    int_cols = {n for n, t in zip(ds.schema().names, ds.schema().types)
                if pa.types.is_integer(t)}
    seen = {(m["col"], m["stat"]) for m in merged}
    for c in int_cols:
        for st in ("min", "max"):
            if (c, st) not in seen:
                merged.append({"col": c, "stat": st, "value": None})

    def distinct_partial(t: pa.Table) -> pd.DataFrame:
        # stringify via ARROW cast so the text form is independent of
        # which batches carry nulls (pandas would render int64 123 as
        # '123' in null-free batches but '123.0' in null-bearing ones,
        # double-counting the same value)
        frames = []
        for ci, c in enumerate(names):
            col = t[c].drop_null()
            try:
                svals = pc.cast(col, pa.string()).to_pandas()
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                svals = col.to_pandas().astype(str)    # nested types
            vals = svals.drop_duplicates()
            h = md5_hash64_series(vals).astype(np.int64)
            frames.append(pd.DataFrame({"col_id": np.int64(ci), "h": h}))
        out = pd.concat(frames, ignore_index=True).drop_duplicates()
        out["part"] = (out["h"].to_numpy().astype(np.uint64)
                       % np.uint64(PROFILE_PARTITIONS)).astype(np.int32)
        return out

    def distinct_part(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates(["col_id", "h"]) \
               .groupby("col_id", sort=False, as_index=False).size()
        return out.rename(columns={"size": "n"})

    routed = ds.map_batches(distinct_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
    parts = exchange_map_groups(routed, "part", PROFILE_PARTITIONS,
                                distinct_part).to_pandas()
    dist = parts.groupby("col_id", sort=False, as_index=False)["n"].sum()
    for r in dist.itertuples():
        merged.append({"col": names[int(r.col_id)], "stat": "distinct",
                       "value": int(r.n)})
    out = pd.DataFrame(merged)
    # nullable Int64 (arrow int64, same wire schema as plain int64) so
    # the all-null-column min/max rows can carry NULL like the oracle;
    # null-free results keep the plain numpy dtype
    out["value"] = out["value"].astype("Int64")
    if not out["value"].isna().any():
        out["value"] = out["value"].astype("int64")
    return out.sort_values(["col", "stat"], ignore_index=True)
