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
                    key_cols: tuple[str, ...] = schemas.KEY_COLS,
                    barriers: list[int] | None = None) -> pd.DataFrame:
    """Fold a set of change records to one record per key.

    Returns a DataFrame with the same columns, one row per key, where
    ``op`` is one of {full, partial, delete} and ``lsn`` is the highest
    lsn folded for that key. Associative: collapse(collapse(A) + B) ==
    collapse(A + B) for lsn-disjoint-or-duplicate inputs.

    ``barriers`` (sorted control-op lsns, see stages/controls.py) split
    the stream into epochs: the fold then keeps one record per
    (key, epoch) instead of per key, so a conditional op can still see
    each key's state as of its own position. An event at exactly a
    barrier lsn folds into the epoch AFTER it (controls apply first).

    Vectorized: one stable sort + a handful of cython groupby kernels;
    no Python loop over rows.
    """
    if df.empty:
        return df
    lsn, op = schemas.LSN_COL, schemas.OP_COL
    # exactly-once vs duplicate delivery: a re-delivered event is keyed
    # by (key, lsn) -> keep one. Equal-lsn records are NOT always byte
    # identical across runs: one run may hold the event collapsed with
    # its earlier history (full@L, payload merged) while another holds
    # the bare re-delivery (partial@L). Rank absolute records above
    # partial so the information-bearing one survives the dedup --
    # keeping the partial would silently null the merged-away columns.
    pr = np.where(df[op].isin((schemas.OP_PARTIAL, schemas.OP_UPDATE)),
                  np.int8(0), np.int8(1))
    df = df.assign(_pr=pr) \
           .sort_values([lsn, "_pr"], kind="stable", ignore_index=True)
    df = df.drop_duplicates(subset=[*key_cols, lsn], keep="last",
                            ignore_index=True).drop(columns="_pr")

    if barriers:
        epoch = np.searchsorted(np.asarray(barriers, dtype=np.int64),
                                df[lsn].to_numpy(), side="right")
        key_codes = df.groupby([*key_cols, pd.Series(epoch, index=df.index)],
                               sort=False, dropna=False).ngroup()
    else:
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


_ALL_OPS = [schemas.OP_INSERT, schemas.OP_UPDATE, schemas.OP_DELETE,
            schemas.OP_FULL, schemas.OP_PARTIAL]
_COLLAPSED_OPS_ARR = None  # [full, partial, delete], built lazily (needs pyarrow)


def fold_table(batch: "pa.Table", payload_cols: list[str],
               kh: np.ndarray | None = None,
               barriers: list[int] | None = None) -> "pa.Table":
    """Arrow/numpy fold of a change-record table (columns: key cols,
    lsn, op, payload, any passthrough) to one collapsed record per key
    — the vectorized equivalent of :func:`collapse_events` (pinned
    row-for-row equal by tests/test_property_fold.py's hypothesis
    differential tests, incl. forced hash collisions and null keys,
    plus tests/test_collapse.py's collision unit test).

    Shape (everything O(n log n) numpy + O(columns) arrow gathers, no
    pandas on the main path): sort by (key-hash, lsn, absolute-rank),
    dedup re-delivered (key, lsn) duplicates keeping the
    information-bearing absolute record, find each group's last
    barrier (insert/full/delete — rows before it can never influence
    the fold), and emit the group's LAST row with each payload column
    overridden by its last non-null value inside that final segment
    (exactly what collapse_events' ffill-then-tail computes). Groups
    whose 64-bit key hashes collide on different REAL keys (vanishing
    probability, checked explicitly) are demoted to the exact pandas
    path, which groups by the real key columns.

    Same interval-partition precondition as collapse_events. With
    ``barriers`` (control-op epochs) the epoch is mixed into the
    group hash, so groups are (key, epoch) — the same grouping
    collapse_events builds from the raw lsns.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from .partition import key_hash

    global _COLLAPSED_OPS_ARR
    if _COLLAPSED_OPS_ARR is None:
        _COLLAPSED_OPS_ARR = pa.array(
            [schemas.OP_FULL, schemas.OP_PARTIAL, schemas.OP_DELETE])

    n = batch.num_rows
    if n == 0:
        return batch
    if kh is None:
        kh = key_hash(batch["conv_id"],
                      batch["turn_idx"].to_numpy(zero_copy_only=False))
    lsn = batch[schemas.LSN_COL].to_numpy(zero_copy_only=False)
    if barriers:
        # epoch barriers (control ops): same key, different epoch must
        # stay distinct groups -- mix the epoch into the key hash (same
        # key/epoch pairs keep identical hashes, so the collision guard
        # below still compares real keys soundly). Equal-lsn duplicates
        # always share an epoch, so the (hash, lsn) dedup stays sound.
        epoch = np.searchsorted(np.asarray(barriers, dtype=np.int64),
                                lsn, side="right").astype(np.uint64)
        kh = kh * np.uint64(0x9E3779B97F4A7C15) + epoch
    codes = pc.index_in(batch[schemas.OP_COL],
                        value_set=pa.array(_ALL_OPS)).to_numpy(zero_copy_only=False)
    is_rel = (codes == 1) | (codes == 4)        # update / partial
    # exactly-once vs duplicate delivery (same ranking as
    # collapse_events): among equal-(key, lsn) records the absolute one
    # must survive the dedup -- rank it last within the (hash, lsn) run
    prn = np.where(is_rel, np.int8(0), np.int8(1))

    order = np.lexsort((prn, lsn, kh))   # stable: arrival breaks full ties
    kh_s = kh[order]
    new_grp = np.ones(n, dtype=bool)
    new_grp[1:] = kh_s[1:] != kh_s[:-1]

    # hash-collision guard BEFORE the dedup (a collision could
    # otherwise swallow a different key's record as a "duplicate"):
    # within repeated-hash positions, verify the REAL key matches the
    # previous row; any mismatching hash-group is demoted to the exact
    # pandas path.
    rep_pos = np.flatnonzero(~new_grp)
    coll_row = None
    if len(rep_pos):
        cur = pa.array(order[rep_pos])
        prv = pa.array(order[rep_pos - 1])
        conv = batch["conv_id"]
        a, b = conv.take(cur), conv.take(prv)
        # null-safe compare: collapse_events groups null keys together
        # (groupby dropna=False), so null == null is the SAME key;
        # pc.equal alone would yield null there and crash the `&` below
        same_conv = pc.or_(
            pc.fill_null(pc.equal(a, b), False),
            pc.and_(pc.is_null(a), pc.is_null(b))).to_numpy(
            zero_copy_only=False)
        turn = batch["turn_idx"].to_numpy(zero_copy_only=False)
        same_key = same_conv & (turn[order[rep_pos]] == turn[order[rep_pos - 1]])
        bad = rep_pos[~same_key]
        if len(bad):
            grp_full = np.cumsum(new_grp) - 1
            collided = np.zeros(int(grp_full[-1]) + 1, dtype=bool)
            collided[np.unique(grp_full[bad])] = True
            coll_row = collided[grp_full]           # ordered coords

    parts: list[pa.Table] = []
    if coll_row is not None:
        sub_t = batch.take(pa.array(np.sort(order[coll_row])))
        folded = collapse_events(sub_t.to_pandas(), payload_cols,
                                 barriers=barriers)
        parts.append(pa.Table.from_pandas(folded[batch.column_names],
                                          schema=sub_t.schema,
                                          preserve_index=False)
                     .replace_schema_metadata(None))
        keep_vec = ~coll_row
        order, kh_s, lsn_s = order[keep_vec], kh_s[keep_vec], lsn[order][keep_vec]
    else:
        lsn_s = lsn[order]

    if len(order):
        # dedup (hash, lsn): keep the LAST of each run (highest
        # absolute-rank, then latest arrival -- the sort key above)
        keep = np.ones(len(order), dtype=bool)
        keep[:-1] = (kh_s[1:] != kh_s[:-1]) | (lsn_s[1:] != lsn_s[:-1])
        o2, k2 = order[keep], kh_s[keep]
        m = len(o2)
        ng = np.ones(m, dtype=bool)
        ng[1:] = k2[1:] != k2[:-1]
        starts = np.flatnonzero(ng)
        grp = np.cumsum(ng) - 1
        idx = np.arange(m, dtype=np.int64)
        ends = np.append(starts[1:], m) - 1
        last_rows = o2[ends]                         # original coords

        # final segment per group: from the LAST barrier row (insert/
        # full/delete resets state) to the group end; rows before it
        # cannot influence the folded record
        is_bar2 = ~is_rel[o2]
        last_bar = np.maximum.reduceat(
            np.where(is_bar2, idx, np.int64(-1)), starts)
        seg_start = np.maximum(last_bar, starts)
        in_last = idx >= seg_start[grp]
        had_bar = last_bar >= 0

        # emit groups in last-row order: a SORTED gather is measurably
        # faster on wide string columns, and the run is sorted again
        # downstream anyway
        sig = np.argsort(last_rows, kind="stable")
        vec = batch.take(pa.array(last_rows[sig]))
        # op: delete if the group's final record is a delete; full when
        # any barrier fixed the row's absolute state; else partial
        last_codes = codes[last_rows[sig]]
        out_code = np.where(last_codes == 2, np.int32(2),
                            np.where(had_bar[sig], np.int32(0),
                                     np.int32(1)))
        vec = vec.set_column(vec.schema.get_field_index(schemas.OP_COL),
                             schemas.OP_COL,
                             _COLLAPSED_OPS_ARR.take(pa.array(out_code)))
        # payload: last non-null value within the final segment (what
        # collapse_events' groupwise ffill leaves on the tail row). A
        # column only differs from the tail row where the tail is null
        # and an earlier in-segment row is not (partial-update
        # inheritance) -- columns with no such group skip the gather.
        for name in payload_cols:
            col = batch.column(name)
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            pos = np.where(valid[o2] & in_last, idx, np.int64(-1))
            lastv = np.maximum.reduceat(pos, starts)
            # lastv == ends: tail row itself non-null (value exact);
            # lastv == -1: whole segment null, tail therefore null too
            if bool(np.all((lastv == ends) | (lastv < 0))):
                continue                     # tail row already exact
            lastv = lastv[sig]
            gather = o2[np.clip(lastv, 0, None)]
            ind = pa.array(gather, mask=lastv < 0)   # null idx -> null
            vec = vec.set_column(
                vec.schema.get_field_index(name), name,
                col.take(ind).combine_chunks())
        parts.append(vec)

    if len(parts) == 1:
        return parts[0]
    return pa.concat_tables(parts, promote_options="default")


class BatchCollapser:
    """map_batches combiner: collapse each batch before the shuffle so
    repeated updates to one key ship once (pre-aggregation pattern).
    `barriers` = committed control-op lsns (epoch boundaries the
    combiner must not fold across)."""

    def __init__(self, payload_cols: list[str],
                 barriers: list[int] | None = None):
        self.payload_cols = list(payload_cols)
        self.barriers = list(barriers) if barriers else None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return collapse_events(batch, self.payload_cols,
                               barriers=self.barriers)
