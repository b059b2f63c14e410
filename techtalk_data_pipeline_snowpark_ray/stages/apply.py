"""The merge-apply core: last-writer-wins fold over change events.

Reference parity: Snowflake ``merge`` whenMatched/whenNotMatched
(insert-only ``IngestOrdersFromRawToFlat.scala:73-89``; update+insert
``IngestRatingsFromRawToFlat.scala:74-103``, ``SampleCrud.scala:38-69``;
conditional update ``SampleCrud.scala:28-36``; conditional delete
``SampleCrud.scala:71-75``; generic wrapper
``SnowflakeUtilsOld.scala:84-109``). The whole CRUD op set
{insert, update(partial), delete} is applied by ONE associative,
vectorized fold, :func:`collapse_events`, reused as:

  * per-batch combiner before the shuffle (pre-aggregation),
  * per-shard apply (inside groupby(shard).map_groups),
  * compaction of a bucket's runs,
  * final snapshot resolution.

Event semantics (in lsn order; ties = arrival order, for re-delivered
duplicates which are byte-identical):

  insert(row)      -> state := row                  (absolute)
  update(partial)  -> state := state <- non-null cols  (upsert if absent;
                      update after delete creates a fresh row)
  delete           -> state := tombstone

Collapsed-record ops are re-foldable: ``full`` acts like insert,
``partial`` like update, ``delete`` like delete. Tombstones survive
until a full-bucket compaction; dropping them there is safe because the
checkpoint offset guarantees no event with lsn <= committed can ever be
re-applied.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import schemas

_OP_MAP_TO_COLLAPSED = {
    schemas.OP_INSERT: schemas.OP_FULL,
    schemas.OP_FULL: schemas.OP_FULL,
    schemas.OP_UPDATE: schemas.OP_PARTIAL,
    schemas.OP_PARTIAL: schemas.OP_PARTIAL,
    schemas.OP_DELETE: schemas.OP_DELETE,
}


def collapse_events(df: pd.DataFrame, payload_cols: list[str],
                    key_cols: tuple[str, ...] = schemas.KEY_COLS) -> pd.DataFrame:
    """Fold a set of change records to one record per key.

    Returns a DataFrame with the same columns, one row per key, where
    ``op`` is one of {full, partial, delete} and ``lsn`` is the highest
    lsn folded for that key. Associative: collapse(collapse(A) + B) ==
    collapse(A + B) for lsn-disjoint-or-duplicate inputs.

    Vectorized: one stable sort + a handful of cython groupby kernels;
    no Python loop over rows.
    """
    if df.empty:
        return df
    lsn, op = schemas.LSN_COL, schemas.OP_COL
    df = df.sort_values(lsn, kind="stable", ignore_index=True)
    # exactly-once vs duplicate delivery: a re-delivered event is byte
    # identical, keyed by (key, lsn) -> keep one
    df = df.drop_duplicates(subset=[*key_cols, lsn], keep="last", ignore_index=True)

    key_codes = df.groupby(list(key_cols), sort=False, dropna=False).ngroup()
    if not key_codes.duplicated().any():
        # fast path: each key appears once -- nothing to fold
        out = df.copy()
        out[op] = out[op].map(_OP_MAP_TO_COLLAPSED)
        return out

    codes = key_codes.to_numpy()
    barrier = df[op].isin(schemas.BARRIER_OPS)
    seg = barrier.groupby(codes, sort=False).cumsum()
    last_seg = seg.groupby(codes, sort=False).transform("max")
    in_last = (seg == last_seg).to_numpy()

    d2 = df.loc[in_last].copy()
    codes2 = codes[in_last]
    had_barrier = (last_seg.to_numpy()[in_last] > 0)
    # forward-fill the payload within the final segment of each key
    # (partial updates inherit earlier values; the segment never crosses
    # a delete/insert barrier, so no stale resurrection)
    d2[payload_cols] = d2.groupby(codes2, sort=False)[payload_cols].ffill()

    is_tail = ~pd.Series(codes2).duplicated(keep="last").to_numpy()
    out = d2.loc[is_tail].copy()
    tail_had_barrier = had_barrier[is_tail]
    out_op = np.where(
        out[schemas.OP_COL].to_numpy() == schemas.OP_DELETE,
        schemas.OP_DELETE,
        np.where(tail_had_barrier, schemas.OP_FULL, schemas.OP_PARTIAL),
    )
    out[schemas.OP_COL] = out_op
    return out.reset_index(drop=True)


def resolve_final(df: pd.DataFrame, payload_cols: list[str],
                  key_cols: tuple[str, ...] = schemas.KEY_COLS,
                  sort: bool = True) -> pd.DataFrame:
    """Collapse to final visible state: fold, drop tombstones, stable
    (conv_id, turn_idx) ordering (the BASELINE.json row invariant)."""
    out = collapse_events(df, payload_cols, key_cols)
    if not out.empty:
        out = out[out[schemas.OP_COL] != schemas.OP_DELETE]
    if sort and not out.empty:
        out = out.sort_values(list(key_cols), kind="stable", ignore_index=True)
    return out


class BatchCollapser:
    """map_batches combiner: collapse each batch before the shuffle so
    repeated updates to one key ship once (pre-aggregation pattern)."""

    def __init__(self, payload_cols: list[str]):
        self.payload_cols = list(payload_cols)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return collapse_events(batch, self.payload_cols)
