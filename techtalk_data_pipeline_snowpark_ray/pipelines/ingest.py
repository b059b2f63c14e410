"""The ingest pipeline: WAL tail -> normalize -> partition -> merge-apply
-> atomic commit; plus snapshot read and compaction.

This is the Ray-Data re-expression of the reference's core loop
(``IngestOrdersFromRawToFlat.scala:63-98``: read stream delta ->
explode/normalize -> merge -> commit advancing the stream offset), with
Snowflake's server-side machinery replaced by:

  tick:     ray.data.read_parquet(new WAL segments)       # stream read S8
            .map_batches(SchemaNormalizer)                # jsonToFields T2
            .map_batches(filter lsn > committed)          # offset semantics
            .map_batches(Partitioner)                     # hash(conv_id)+salt
            .map_batches(BatchCollapser)                  # combiner pre-agg
            .groupby(shard).map_groups(BucketApplier)     # merge U1-U7
            -> run files + metrics -> manifest publish    # txn commit U7

All heavy work streams through the object store with backpressure; the
driver touches only segment lists and a one-row-per-shard metrics frame.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from .. import schemas
from ..config import EngineConfig
from ..sources import wal
from ..stages.apply import (BatchCollapser, collapse_events, fold_table,
                            resolve_final)
from ..stages.normalize import SchemaNormalizer, normalize_batch
from ..stages.partition import (BUCKET_COL, KEY_HASH_COL, SHARD_COL,
                                Partitioner, add_partition_cols,
                                hash_strings_arrow, key_hash)
from ..state.manifest import CommitConflict, Manifest, TableState

_BOOKKEEPING = (schemas.LSN_COL, schemas.OP_COL)


# --------------------------------------------------------------------------
# WAL tail -> normalized change Dataset
# --------------------------------------------------------------------------

def tail_changes(cfg: EngineConfig, committed_seq: int, normalize: bool = True,
                 ) -> tuple[ray.data.Dataset | None, list[wal.Segment]]:
    """Dataset of unconsumed, schema-normalized change records (every
    row of every segment with seq > committed_seq), or (None, []) when
    the log has no news.

    Offset semantics are per *segment* (seq), never per row: segments
    are disjoint lsn intervals (see sources/wal.py INTERVAL CONTRACT),
    so no row filtering, no watermark holes, and replaying a consumed
    file is a no-op by construction.
    """
    segments = wal.list_segments(cfg.wal_dir, after_seq=committed_seq)
    if not segments:
        return None, []
    target = schemas.table_schema(cfg.schema_version)
    # ONE scan over all segments regardless of their schema version: the
    # scanner projects every fragment onto the current change schema
    # (missing columns null-filled, widened types cast) -- so the whole
    # tick stays a single fused read->normalize->partition->apply chain
    # with no union barrier and no extra object-store round-trips.
    scan_schema = schemas.change_schema(cfg.schema_version)
    ds = ray.data.read_parquet([s.path for s in segments], schema=scan_schema)
    if normalize:
        ds = ds.map_batches(
            SchemaNormalizer(target, keep_extra=_BOOKKEEPING),
            # batch_size=None: 1:1 with blocks -- every stage upstream
            # of the per-block collapse must preserve block contiguity
            # (bundling interleaves non-consecutive blocks)
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )
    return ds, segments


def detect_hot_convs(ds: ray.data.Dataset, threshold: int,
                     batch_size: int) -> list[str]:
    """Optional skew pre-pass: conversations with more events than
    `threshold` in this tick. Pre-aggregates per batch (one row per conv
    per batch) before the small groupby, so the shuffle moves counts,
    not events."""

    def partial_counts(batch: pa.Table) -> pa.Table:
        counts = pd.Series(batch.column("conv_id").to_numpy(zero_copy_only=False)) \
                   .value_counts()
        return pa.table({"conv_id": counts.index.astype(object),
                         "n": counts.to_numpy(dtype=np.int64)})

    import pyarrow.compute as pc

    agg = (ds.map_batches(partial_counts, batch_format="pyarrow", batch_size=batch_size)
             .groupby("conv_id").sum("n"))
    hot = agg.map_batches(
        lambda t: t.filter(pc.greater(t["sum(n)"], pa.scalar(int(threshold)))).select(["conv_id"]),
        batch_format="pyarrow")
    return [r["conv_id"] for r in hot.take_all()]  # small by construction


# --------------------------------------------------------------------------
# merge-apply (the stateful stage)
# --------------------------------------------------------------------------

RUN_COLS_FIXED = [BUCKET_COL, *schemas.KEY_COLS, schemas.LSN_COL, schemas.OP_COL]


class BucketApplier:
    """Per-shard merge applier used inside groupby(shard).map_groups.

    Folds the shard's change records (LWW by lsn), writes one run file
    with a txn-deterministic name (idempotent under task retry: a retry
    atomically overwrites the same path with the same content), and
    returns a one-row metrics frame. The heavy data never flows back to
    the driver.

    Reference parity: the merge statement + MergeResult metrics
    (``SnowflakeUtilsOld.scala:84-109``,
    ``IngestOrdersFromRawToFlat.scala:89-92``).
    """

    def __init__(self, runs_dir: str, txn_id: str, payload_cols: list[str],
                 salt_factor: int = 1, derived_views: tuple = (),
                 barriers: list[int] | None = None):
        self.runs_dir = runs_dir
        self.txn_id = txn_id
        self.payload_cols = list(payload_cols)
        self.salt_factor = salt_factor
        self.derived_views = tuple(derived_views)
        self.barriers = list(barriers) if barriers else None

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return _empty_metrics()
        shard = int(group[SHARD_COL].iloc[0])
        bucket = shard // self.salt_factor if self.salt_factor > 1 else int(group[BUCKET_COL].iloc[0])
        n_src = int(group["_n"].sum()) if "_n" in group.columns else len(group)

        out = collapse_events(group, self.payload_cols, barriers=self.barriers)
        out = out.sort_values(list(schemas.KEY_COLS), kind="stable", ignore_index=True)
        ops = out[schemas.OP_COL].value_counts()

        fname = f"run-b{bucket:05d}-x{self.txn_id}-s{shard % max(self.salt_factor, 1):03d}.parquet"
        path = os.path.join(self.runs_dir, fname)
        cols = RUN_COLS_FIXED + self.payload_cols
        table = pa.Table.from_pandas(out[cols], preserve_index=False) \
            .replace_schema_metadata(None)
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(table, tmp, compression="zstd")
        os.replace(tmp, path)

        derived_file = None
        if self.derived_views:
            # exact per-key source-event counts survive the combiner
            # through the `_n` column (views that need raw per-event
            # attributes disable the combiner via exact_after_combine)
            counts = (group["_n"].to_numpy(dtype=np.int64)
                      if "_n" in group.columns else None)
            derived_file = write_derived_partials(
                pa.Table.from_pandas(
                    group.drop(columns=["_n"], errors="ignore"),
                    preserve_index=False).replace_schema_metadata(None),
                self.derived_views, self.runs_dir, self.txn_id,
                counts=counts)

        return pd.DataFrame([{
            "bucket": bucket, "shard": shard, "file": fname,
            "events_in": n_src, "records_out": len(out),
            "n_full": int(ops.get(schemas.OP_FULL, 0)),
            "n_partial": int(ops.get(schemas.OP_PARTIAL, 0)),
            "n_delete": int(ops.get(schemas.OP_DELETE, 0)),
            "max_lsn": int(out[schemas.LSN_COL].max()),
            "derived_file": derived_file,
        }])


_COLLAPSED_OPS = pa.array([schemas.OP_FULL, schemas.OP_PARTIAL, schemas.OP_DELETE])


class DirectApplier:
    """Shuffle-free (LSM-style) apply used when cfg.apply_mode ==
    "direct": each task folds its lsn-interval batch, sorts by
    (bucket, conv_id, turn_idx) and writes one delta run straight to
    storage -- no all-to-all in the ingest hot path, so throughput
    scales linearly with cores. Cross-run LWW resolution is deferred to
    compaction / snapshot read, which operate on the already-collapsed
    (much smaller) records.

    Hot-path note: the whole per-batch fold runs in Arrow/numpy
    (`stages.apply.fold_table`: one lexsort over (key-hash, lsn,
    absolute-rank) plus O(columns) gathers) -- repeated-key batches pay
    no pandas groupby. Only hash-groups where two DIFFERENT real keys
    collide on the 64-bit key hash (vanishing probability, checked
    explicitly) are demoted to the exact pandas collapse, which groups
    by the REAL key columns; collisions are thereby harmless.

    ``fold=False`` is the PASS-THROUGH mode for inputs that are NOT
    lsn-interval batches (replication windows: already-collapsed run
    records whose lsn ranges interleave arbitrarily across files, and
    which Ray's rebatching may bundle/split any way). Folding such a
    batch is unsound — collapsing a FULL with a later PARTIAL can mint
    a full record whose lsn masks an intermediate PARTIAL that landed
    in a sibling batch — so pass-through re-partitions and lands the
    records verbatim; read-time LWW resolution (which needs no
    interval precondition) produces the exact state.
    """

    def __init__(self, runs_dir: str, txn_id: str, payload_cols: list[str],
                 pre_stages: tuple = (), scan_schema: pa.Schema | None = None,
                 derived_views: tuple = (),
                 barriers: list[int] | None = None, fold: bool = True):
        self.runs_dir = runs_dir
        self.txn_id = txn_id
        self.payload_cols = list(payload_cols)
        self.pre_stages = tuple(pre_stages)
        self.scan_schema = scan_schema
        self.derived_views = tuple(derived_views)
        self.barriers = list(barriers) if barriers else None
        self.fold = fold

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        if "paths" in batch.column_names:
            # fused-read mode: rows are segment-path groups; scan each
            # group in-task (no object-store hop for the data)
            frames = [self._apply_one(self._scan(group.as_py()))
                      for group in batch["paths"]]
            return pd.concat(frames, ignore_index=True) if frames else _empty_metrics()
        return self._apply_one(batch)

    def _scan(self, paths: list[str]) -> pa.Table:
        import pyarrow.dataset as pads
        # single-threaded per-task scan: parallelism comes from the
        # task fan-out; nested arrow IO pools (workers x io threads)
        # oversubscribe the host at high parallelism (pinned by A/B)
        return pads.dataset(paths, format="parquet",
                            schema=self.scan_schema) \
            .to_table(use_threads=False)

    def _apply_one(self, batch: pa.Table) -> pd.DataFrame:
        for stage in self.pre_stages:   # manually fused normalize/partition
            batch = stage(batch)
        n = batch.num_rows
        if n == 0:
            return _empty_metrics()
        cols = RUN_COLS_FIXED + self.payload_cols
        if self.fold:
            kh = batch[KEY_HASH_COL].to_numpy(zero_copy_only=False)
            out = fold_table(batch.select(cols), self.payload_cols, kh=kh,
                             barriers=self.barriers)
        else:
            out = batch.select(cols)
        # order the run by (bucket, key-hash, lsn): pure-integer sort
        # that still co-locates each bucket's keys for read locality
        # (the user-visible (conv_id, turn_idx) ordering is produced by
        # compaction / snapshot resolution, not by run files)
        okh = key_hash(out["conv_id"],
                       out["turn_idx"].to_numpy(zero_copy_only=False))
        out = out.take(pa.array(np.lexsort((
            out[schemas.LSN_COL].to_numpy(zero_copy_only=False), okh,
            out[BUCKET_COL].to_numpy(zero_copy_only=False)))))

        fname = f"delta-x{self.txn_id}-{uuid.uuid4().hex[:12]}.parquet"
        path = os.path.join(self.runs_dir, fname)
        tmp = path + ".tmp"
        pq.write_table(out, tmp, compression="zstd")
        os.replace(tmp, path)

        derived_file = write_derived_partials(batch, self.derived_views,
                                              self.runs_dir, self.txn_id)

        op_counts = dict(zip(*np.unique(
            pc.index_in(out[schemas.OP_COL], value_set=_COLLAPSED_OPS)
            .to_numpy(zero_copy_only=False), return_counts=True)))
        return pd.DataFrame([{
            "bucket": -1, "shard": -1, "file": fname,
            "events_in": n, "records_out": out.num_rows,
            "n_full": int(op_counts.get(0, 0)),
            "n_partial": int(op_counts.get(1, 0)),
            "n_delete": int(op_counts.get(2, 0)),
            # (min, max) input lsn: the driver verifies all batches'
            # ranges are pairwise disjoint BEFORE publishing -- the
            # fold's interval precondition made checkable
            "min_lsn": int(pc.min(batch[schemas.LSN_COL]).as_py()),
            "max_lsn": int(pc.max(batch[schemas.LSN_COL]).as_py()),
            "derived_file": derived_file,
        }])


def _check_batch_intervals(metrics: pd.DataFrame) -> None:
    """Verify the direct-mode fold precondition: every batch's input
    lsn range [min, max] must be pairwise disjoint (boundary EQUALITY
    is allowed — a duplicate re-delivery, confined to reorder-slack
    distance by the WAL writer's contract, can legally straddle a
    batch split as two equal-lsn records, which the terminal fold's
    (key, lsn) dedup resolves). A violation means the executor handed
    a task non-consecutive blocks; the tick aborts BEFORE publish (its
    written runs are unreferenced orphans, GC-sweepable), so nothing
    corrupt ever commits."""
    if "min_lsn" not in metrics.columns:
        return
    m = metrics.dropna(subset=["min_lsn", "max_lsn"])
    if len(m) < 2:
        return
    lo = m["min_lsn"].to_numpy(dtype=np.int64)
    hi = m["max_lsn"].to_numpy(dtype=np.int64)
    order = np.argsort(lo, kind="stable")
    lo, hi = lo[order], hi[order]
    bad = np.flatnonzero(lo[1:] < hi[:-1])
    if bad.size:
        i = int(bad[0])
        raise RuntimeError(
            "direct-apply batch interval violation: batch "
            f"[{lo[i + 1]}, {hi[i + 1]}] overlaps [{lo[i]}, {hi[i]}] — "
            "the executor delivered non-consecutive blocks to one fold "
            "task; tick aborted before publish (no corrupt state "
            "committed; orphan runs are GC-sweepable)")


def _empty_metrics() -> pd.DataFrame:
    return pd.DataFrame({
        "bucket": pd.Series(dtype="int64"), "shard": pd.Series(dtype="int64"),
        "file": pd.Series(dtype="object"), "events_in": pd.Series(dtype="int64"),
        "records_out": pd.Series(dtype="int64"), "n_full": pd.Series(dtype="int64"),
        "n_partial": pd.Series(dtype="int64"), "n_delete": pd.Series(dtype="int64"),
        "min_lsn": pd.Series(dtype="int64"),
        "max_lsn": pd.Series(dtype="int64"),
        "derived_file": pd.Series(dtype="object"),
    })


from .derived import DERIVED_CONV_STATS, resolve_views  # noqa: E402


def write_derived_partials(batch: pa.Table, view_names, runs_dir: str,
                           txn_id: str,
                           counts: "np.ndarray | None" = None) -> str | None:
    """Write one additive partial file per registered derived view for
    this batch (see pipelines/derived.py). Written by the same task that
    applies the delta; all partials become visible only through the same
    manifest publish as the main table (atomic multi-sink). Returns a
    JSON {view: filename} string for the metrics row (None when no
    views are configured)."""
    import json

    if not view_names:
        return None
    out: dict[str, str] = {}
    for view in resolve_views(view_names):
        agg = view.partial(batch, counts)
        fname = f"derived-{view.name}-x{txn_id}-{uuid.uuid4().hex[:12]}.parquet"
        path = os.path.join(runs_dir, fname)
        tmp = path + ".tmp"
        pq.write_table(agg, tmp, compression="zstd")
        os.replace(tmp, path)
        out[view.name] = fname
    return json.dumps(out)


# --------------------------------------------------------------------------
# the tick (one consumed delta, one atomic commit)
# --------------------------------------------------------------------------

def _segment_groups(segments: list[wal.Segment],
                    cfg: EngineConfig) -> list[list[str]]:
    """Partition the (seq-ordered) segment list into consecutive groups
    of ~cfg.direct_batch_rows rows each (exact footer counts, no data
    read): the unit of fused read+apply work. Consecutive seqs => each
    group is an lsn interval (the fold's soundness precondition).
    Sizing by ROWS, not compressed bytes — transcript text compresses
    ~6x, so a byte target makes groups too big and starves the task
    fan-out."""
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_rows = 0
    for s in segments:
        rows = pq.read_metadata(s.path).num_rows
        if cur and cur_rows + rows > cfg.direct_batch_rows:
            groups.append(cur)
            cur, cur_rows = [], 0
        cur.append(s.path)
        cur_rows += rows
    if cur:
        groups.append(cur)
    return groups


def _check_bucket_layout(prev: Manifest, cfg: EngineConfig) -> None:
    """Refuse to write with a bucket count that differs from the one the
    table's existing run files were laid out with (bucket is a persisted
    routing key; see Manifest.num_buckets). A mismatch requires an
    explicit re-bucketing compaction, not a silent config change."""
    if (prev.num_buckets and prev.num_buckets != cfg.num_buckets
            and (prev.buckets or prev.global_runs)):
        raise ValueError(
            f"table was committed with num_buckets={prev.num_buckets} but "
            f"cfg.num_buckets={cfg.num_buckets}; changing the bucket count "
            "on an existing table splits persisted LWW state across "
            "compaction groups. Re-bucket via a full compaction with the "
            "old count first, or keep the committed value.")


# --------------------------------------------------------------------------
# optimistic concurrency: commutable-conflict rebase (the retry half of U7)
# --------------------------------------------------------------------------
#
# `TableState.publish` gives conflict DETECTION (exactly one winner per
# version; the loser's runs stay invisible). The helpers below add
# conflict RESOLUTION: a losing transaction whose effects COMMUTE with
# every winner re-publishes its already-written run files on top of the
# new latest manifest instead of recomputing the whole transaction.
# Soundness rests on the layout's separation of content from position:
# delta runs are per-key LWW-collapsed records of THEIR OWN WAL window
# only (they never read the parent snapshot), and compacted bases fold
# a frozen run list, so in both cases the parent manifest contributes
# bookkeeping (file lists, watermarks), not data. What can NOT commute,
# and always raises:
#   * two WAL-consuming ticks (both tails started at the same
#     committed_seq, so their windows overlap -> duplicate application);
#   * a winner that ADDED control ops vs a tick whose folds were
#     collapsed without those barriers (epoch assignment would differ);
#   * competing compactions / matview refreshes (both REWRITE file
#     lists -- detected as a non-prefix change) and bucket-layout
#     migrations (routing key changes under the loser's feet).


def _op_keys(ops: list | None) -> set:
    import json as _json
    return {_json.dumps(d, sort_keys=True) for d in (ops or [])}


def _is_prefix(a: list, b: list) -> bool:
    return len(a) <= len(b) and list(b[:len(a)]) == list(a)


@dataclass
class _AppendTxn:
    """The reusable products of an append-shaped transaction (ingest
    tick, control-only tick, replication window): everything needed to
    rebuild its manifest on a DIFFERENT parent without recomputing."""
    txn_id: str
    num_buckets: int
    bucket_appends: list          # [(bucket_str, run_file), ...]
    global_appends: list          # [run_file, ...]
    derived_appends: dict         # view -> [run_file, ...] (additive)
    new_control_ops: list         # ControlOp dicts ADDED by this txn
    wal_consumed: list
    committed_seq: int
    committed_lsn: int
    schema_version: int
    metrics: dict
    #: False for replication windows: they are seq-independent, so a
    #: concurrent WAL-consuming tick on the destination still commutes
    consumes_wal: bool = True


def _build_append_manifest(prev: Manifest, t: _AppendTxn) -> Manifest:
    from ..stages.controls import sorted_controls
    buckets = {k: list(v) for k, v in prev.buckets.items()}
    for b, f in t.bucket_appends:
        buckets.setdefault(b, []).append(f)
    derived = {k: list(v) for k, v in prev.derived.items()}
    for view, files in t.derived_appends.items():
        derived.setdefault(view, []).extend(files)
    ops = [c.to_dict() for c in sorted_controls(
        list(prev.control_ops or []) + list(t.new_control_ops))]
    return Manifest(
        txn_id=t.txn_id,
        committed_seq=max(prev.committed_seq, t.committed_seq),
        committed_lsn=max(prev.committed_lsn, t.committed_lsn),
        schema_version=max(prev.schema_version, t.schema_version),
        num_buckets=max(prev.num_buckets, t.num_buckets),
        buckets=buckets,
        global_runs=list(prev.global_runs) + list(t.global_appends),
        derived=derived,
        control_ops=ops,
        wal_consumed=list(t.wal_consumed),
        metrics=t.metrics,
    )


def _publish_append_rebased(state: TableState, cfg: EngineConfig,
                            prev_version: int | None, prev: Manifest,
                            t: _AppendTxn) -> Manifest:
    """Publish an append txn, rebasing over commutable winners (see the
    section comment above) up to ``cfg.commit_retries`` times."""
    for attempt in range(max(0, cfg.commit_retries) + 1):
        try:
            return state.publish(expected_parent=prev_version,
                                 manifest=_build_append_manifest(prev, t))
        except CommitConflict:
            if attempt >= cfg.commit_retries:
                raise
            new_version, new_prev = state.load_latest_versioned()
            if t.consumes_wal and new_prev.committed_seq != prev.committed_seq:
                raise CommitConflict(
                    f"concurrent transaction advanced committed_seq "
                    f"{prev.committed_seq} -> {new_prev.committed_seq} "
                    f"while txn {t.txn_id} consumed the same WAL window; "
                    "not rebasable (would apply the window twice) -- "
                    "reload state and re-run the tick")
            if _op_keys(new_prev.control_ops) - _op_keys(prev.control_ops):
                raise CommitConflict(
                    f"concurrent transaction added control ops; txn "
                    f"{t.txn_id}'s folds were collapsed without those "
                    "barriers -- reload state and re-run the tick")
            if new_prev.num_buckets and t.num_buckets \
                    and new_prev.num_buckets != t.num_buckets:
                raise CommitConflict(
                    "concurrent bucket-layout migration; not rebasable")
            # walk EVERY winner in the window (not just the tip: a
            # later tick can hide an erasure two versions back): a
            # physical erasure never commutes -- this txn's
            # already-written delta files may hold the erased key's
            # pre-scrub rows, and re-pointing them would resurrect it
            lo = 0 if prev_version is None else prev_version + 1
            for v in range(lo, (new_version or 0) + 1):
                wm = state.load(v).metrics
                if wm.get("erasure") is not None:
                    raise CommitConflict(
                        f"concurrent physical erasure at v{v}; not "
                        "rebasable (the txn's run files may hold "
                        "pre-erasure rows) -- reload state and re-run "
                        "the tick")
                # a rollback never commutes either: rebasing over a
                # REWIND would re-advance committed_seq via the max()
                # in _build_append_manifest (silently undoing the
                # offset rewind without re-consuming the segments),
                # and over a RESTORE would re-inflate committed_lsn
                # past rows the restore dropped, corrupting the
                # watermark used for control-op placement and lag
                if wm.get("rollback_to") is not None:
                    raise CommitConflict(
                        f"concurrent rollback at v{v} "
                        f"(mode={wm.get('rollback_mode')}); not "
                        "rebasable (seq/lsn watermarks were rewound) "
                        "-- reload state and re-run the tick")
            t.metrics = {**t.metrics, "rebased_onto": new_version}
            prev_version, prev = new_version, new_prev
    raise AssertionError("unreachable")


def _publish_compaction_rebased(state: TableState, cfg: EngineConfig,
                                prev_version: int | None, prev: Manifest,
                                txn: str,
                                my_buckets: dict,
                                my_derived: dict,
                                keep_ops: list,
                                my_schema: int,
                                num_buckets: int,
                                metrics: dict,
                                rebucket: bool) -> Manifest:
    """Publish a compaction, rebasing over concurrent APPEND winners:
    the compaction folded the base manifest's frozen run list, so any
    files a winner appended after it are simply carried forward on top
    of the new bases. Winners that REWROTE lists (another compaction, a
    matview refresh) or consumed absorbed-op territory do not commute
    and raise. A `rebucket` migration never rebases: the routing key
    itself changed, so concurrent appends under the old layout would
    land mis-bucketed next to the new bases."""
    import json as _json

    from ..stages.controls import sorted_controls
    base = prev                   # the manifest whose runs were folded
    absorbed = _op_keys(base.control_ops) - _op_keys(keep_ops)

    def _manifest_on(parent: Manifest) -> Manifest:
        """This compaction's manifest rebuilt on `parent` (== base on
        the first attempt): my bases + every file a winner appended
        AFTER the base snapshot (per-bucket / global / per-view tails),
        ops = my keeps + winner additions. Always derived from the
        ORIGINAL base products, so repeated rebases never double-count
        an earlier winner's tail."""
        buckets = {b: list(v) for b, v in my_buckets.items()}
        for b, runs in parent.buckets.items():
            tail = runs[len(base.buckets.get(b, [])):]
            if tail:
                buckets.setdefault(b, []).extend(tail)
        derived = {v: list(f) for v, f in my_derived.items()}
        for v, files in parent.derived.items():
            tail = files[len(base.derived.get(v, [])):] \
                if v in base.derived or v in derived else list(files)
            if tail:
                derived.setdefault(v, []).extend(tail)
        ops = [d for d in parent.control_ops
               if _json.dumps(d, sort_keys=True) not in absorbed] \
            if parent is not base else list(keep_ops)
        return Manifest(
            txn_id=txn,
            committed_seq=parent.committed_seq,
            committed_lsn=parent.committed_lsn,
            schema_version=max(my_schema, parent.schema_version),
            num_buckets=num_buckets,
            buckets=buckets,
            global_runs=parent.global_runs[len(base.global_runs):],
            derived=derived,
            control_ops=[c.to_dict() for c in sorted_controls(ops)],
            wal_consumed=[],
            metrics=metrics,
        )

    for attempt in range(max(0, cfg.commit_retries) + 1):
        try:
            return state.publish(expected_parent=prev_version,
                                 manifest=_manifest_on(prev))
        except CommitConflict:
            if attempt >= cfg.commit_retries or rebucket:
                raise
            new_version, new_prev = state.load_latest_versioned()
            # winners must be pure appends over the base this
            # compaction folded: every base list a prefix, no op
            # removed, layout unchanged
            if new_prev.num_buckets != base.num_buckets \
                    and base.num_buckets:
                raise CommitConflict(
                    "concurrent bucket-layout migration; not rebasable")
            if not _is_prefix(base.global_runs, new_prev.global_runs) \
                    or any(not _is_prefix(runs,
                                          new_prev.buckets.get(b, []))
                           for b, runs in base.buckets.items()) \
                    or any(not _is_prefix(files,
                                          new_prev.derived.get(v, []))
                           for v, files in base.derived.items()):
                raise CommitConflict(
                    "concurrent transaction rewrote run lists this "
                    "compaction folded (competing compaction, matview "
                    "refresh or migration); not rebasable -- re-run "
                    "compaction from the new state")
            if _op_keys(base.control_ops) - _op_keys(new_prev.control_ops):
                raise CommitConflict(
                    "concurrent transaction removed control ops this "
                    "compaction still carries; not rebasable")
            metrics = {**metrics, "rebased_onto": new_version}
            prev_version, prev = new_version, new_prev
    raise AssertionError("unreachable")


@dataclass
class TickResult:
    manifest: Manifest
    events_applied: int
    records_written: int
    segments_consumed: int

    @property
    def committed_lsn(self) -> int:
        return self.manifest.committed_lsn


def apply_tick(cfg: EngineConfig, hot_convs: list[str] | None = None,
               control_ops: list | None = None) -> TickResult | None:
    """Consume everything new in the WAL and commit one snapshot version.

    `control_ops` (stages/controls.py ControlOp) are conditional
    UPDATE/DELETE ... WHERE table ops positioned at their lsn in the
    stream (``SampleCrud.scala:28-36,71-75`` parity); they are committed
    with the tick and act as epoch barriers for every fold from here on.

    Returns None when there is nothing to consume (control-only ticks
    publish a manifest carrying just the new ops). Crash-safe: nothing
    is visible until the manifest LATEST pointer is swapped.
    """
    from ..stages.controls import sorted_controls

    cfg.ensure_dirs()
    state = TableState(cfg.table_dir)
    prev_version, prev = state.load_latest_versioned()
    _check_bucket_layout(prev, cfg)

    new_controls = sorted_controls(control_ops)
    for op in new_controls:
        if op.lsn <= prev.committed_lsn:
            raise ValueError(
                f"control op at lsn {op.lsn} <= committed_lsn "
                f"{prev.committed_lsn}: already-committed records were "
                "folded without this barrier; position new ops after "
                "the committed watermark")
    # re-sort the UNION: a pending future-dated op plus a new lower-lsn
    # op would otherwise leave barriers unsorted, and np.searchsorted
    # over an unsorted barrier list mis-assigns fold epochs silently
    all_controls = sorted_controls(list(prev.control_ops or [])
                                   + new_controls)
    barriers = [c.lsn for c in all_controls] or None
    if new_controls and not wal.list_segments(cfg.wal_dir,
                                              after_seq=prev.committed_seq):
        # control-only tick: nothing to fold, just commit the ops.
        # consumes_wal=True is deliberate: an op's lsn position was
        # validated against prev.committed_lsn, so a concurrent
        # WAL-consuming winner invalidates it (rebase would commit an
        # op at/below the new watermark) -- conflict instead.
        manifest = _publish_append_rebased(state, cfg, prev_version, prev, _AppendTxn(
            txn_id=state.new_txn(), num_buckets=cfg.num_buckets,
            bucket_appends=[], global_appends=[], derived_appends={},
            new_control_ops=[c.to_dict() for c in new_controls],
            wal_consumed=[], committed_seq=prev.committed_seq,
            committed_lsn=prev.committed_lsn,
            schema_version=prev.schema_version,
            metrics={"control_only": True}))
        return TickResult(manifest, 0, 0, 0)
    direct_mode = cfg.apply_mode == "direct"
    if direct_mode:
        # fused-read path builds its own per-group scans; only list here
        segments = wal.list_segments(cfg.wal_dir, after_seq=prev.committed_seq)
        ds = None
    else:
        ds, segments = tail_changes(cfg, prev.committed_seq)
    if not segments:
        return None
    payload = schemas.payload_cols(cfg.schema_version)
    direct = direct_mode
    view_names = list(cfg.derived_views)
    if cfg.derived_conv_stats and DERIVED_CONV_STATS not in view_names:
        view_names.append(DERIVED_CONV_STATS)
    views = resolve_views(view_names)
    # views reading per-event attributes the fold collapses away need
    # raw events in the applier -> skip the pre-shuffle combiner
    pre_collapse = cfg.pre_collapse and all(v.exact_after_combine
                                            for v in views)

    if not direct:
        # the key extractor rewrites key columns; both skew detection
        # and validation must see the keys the partitioner will hash,
        # so it applies FIRST (a post-extraction hot key would
        # otherwise never be salted)
        key_extractor = cfg.extras.get("key_extractor")
        if key_extractor is not None:
            ds = ds.map_batches(key_extractor, batch_format="pyarrow",
                                batch_size=None,   # block contiguity
                                zero_copy_batch=True)
        if hot_convs is None and cfg.hot_key_threshold > 0:
            # the pre-pass only counts keys: with no extractor in
            # play, probe a conv_id-ONLY scan of the same segments
            # instead of re-reading the full-width change stream
            # (an extractor derives keys from other columns, which
            # forces the full scan it already went through above)
            probe = ds if key_extractor is not None \
                else ray.data.read_parquet([s.path for s in segments],
                                           columns=["conv_id"])
            hot_convs = detect_hot_convs(probe, cfg.hot_key_threshold,
                                         cfg.batch_size)
    hot_ref = ray.put(list(hot_convs)) if hot_convs else None

    txn = state.new_txn()

    if direct:
        # Fully fused stage: each task scans its OWN group of WAL
        # segments straight from storage (what every worker on a real
        # cluster does), then normalize + partition + fold + write --
        # zero data bytes transit the object store; only segment paths
        # in and one metrics row per group out. Groups are consecutive
        # seq runs, so each group is an lsn interval (fold precondition).
        normalizer = SchemaNormalizer(schemas.table_schema(cfg.schema_version),
                                      keep_extra=_BOOKKEEPING)
        partitioner = Partitioner(cfg.num_buckets, 1, None, include_key_hash=True)
        # key-extractor hook (J7 expression merge keys, SampleCrud.scala:
        # 47-51: merge ON substring(code, 0, 4)): a table->table callable
        # rewriting the key columns BEFORE partitioning, so routing,
        # fold and storage all see the extracted key
        key_extractor = cfg.extras.get("key_extractor")
        pre = [normalizer]
        if key_extractor:
            pre.append(key_extractor)
        # validator sits AFTER the key extractor (it must judge the
        # keys the partitioner will actually hash -- a raw null key the
        # extractor can derive is fine; an extractor emitting a null
        # key must be caught) and BEFORE the partitioner
        if cfg.bad_record_policy != "none":
            from ..stages.validate import QUARANTINE_SUBDIR, ChangeValidator
            pre.append(ChangeValidator(
                cfg.bad_record_policy,
                os.path.join(cfg.table_dir, QUARANTINE_SUBDIR), txn))
        pre.append(partitioner)
        pre = tuple(pre)
        applier = DirectApplier(runs_dir=state.runs_dir, txn_id=txn,
                                payload_cols=payload,
                                pre_stages=pre,
                                scan_schema=schemas.change_schema(cfg.schema_version),
                                derived_views=tuple(view_names),
                                barriers=barriers)
        # DEFAULT: explicit consecutive-segment groups, each scanned
        # and folded IN ONE TASK (`_segment_groups` → DirectApplier's
        # fused-read path). This is the only batching whose interval
        # soundness is guaranteed BY CONSTRUCTION: the fold's collapse
        # is associative only over lsn-interval inputs, and letting Ray
        # form the fold units violates that two different ways —
        # cross-block bundles (batch_size=N) mix whichever blocks
        # complete first (observed corrupting nullable columns on a
        # 490-segment WAL at 32 cpus), and per-block mapping
        # (batch_size=None) under read→map fusion degrades to the
        # parquet scanner's ~10k-row mini-batches (28x the run files).
        # The historical io-thread oversubscription of in-task scans is
        # fixed by single-threaded per-task reads (parallelism comes
        # from the task fan-out, not nested arrow thread pools).
        # `_check_batch_intervals` still verifies the invariant on
        # every tick before anything publishes.
        if cfg.extras.get("ray_read", False):
            # escape hatch for A/B: Ray read + per-block folds (sound,
            # but fold-unit size is at the scanner's mercy)
            ds = ray.data.read_parquet(
                [s.path for s in segments],
                schema=schemas.change_schema(cfg.schema_version))
            metrics_ds = ds.map_batches(applier, batch_format="pyarrow",
                                        batch_size=None,
                                        zero_copy_batch=True)
        else:
            # group size targets ~direct_batch_rows of decompressed
            # rows via compressed bytes; built from the ALREADY-listed
            # segments (re-listing would race a live WAL writer)
            groups = _segment_groups(segments, cfg)
            paths_ds = ray.data.from_items(
                [{"paths": g} for g in groups],
                override_num_blocks=max(1, len(groups)))
            metrics_ds = paths_ds.map_batches(applier,
                                              batch_format="pyarrow",
                                              batch_size=1)
    else:
        # key_extractor already applied (before skew detection)
        if cfg.bad_record_policy != "none":
            # after the extractor, before the partitioner (see the
            # direct-mode ordering note)
            from ..stages.validate import QUARANTINE_SUBDIR, ChangeValidator
            ds = ds.map_batches(
                ChangeValidator(cfg.bad_record_policy,
                                os.path.join(cfg.table_dir,
                                             QUARANTINE_SUBDIR), txn),
                batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True)
        ds = ds.map_batches(
            Partitioner(cfg.num_buckets, cfg.salt_factor, hot_ref),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )
        if pre_collapse:
            # combiner before the shuffle (same interval precondition)
            ds = ds.map_batches(_CountingCollapser(payload, barriers=barriers),
                                batch_format="pandas", batch_size=None)
        applier_kwargs = dict(runs_dir=state.runs_dir, txn_id=txn,
                              payload_cols=payload, salt_factor=cfg.salt_factor,
                              derived_views=tuple(view_names),
                              barriers=barriers)
        if cfg.apply_concurrency:
            # actor-pool applier (explicit ST1 lifecycle) stays on the
            # Dataset groupby; the exchange below is task-shaped
            metrics_ds = ds.groupby(SHARD_COL) \
                .map_groups(BucketApplier, batch_format="pandas",
                            fn_constructor_kwargs=applier_kwargs,
                            concurrency=cfg.apply_concurrency)
        else:
            from ..stages.exchange import exchange_map_groups

            applier = BucketApplier(**applier_kwargs)

            def apply_shard(group: pd.DataFrame) -> pd.DataFrame:
                return applier(group)

            # raw hash exchange instead of the sort-based groupby
            # shuffle: shards only need co-location, not global order
            metrics_ds = exchange_map_groups(ds, SHARD_COL, cfg.num_shards,
                                             apply_shard, keep_part_col=True)
    # The per-batch collapse (DirectApplier fold / shuffle-mode
    # pre-collapse combiner) is only associative over lsn-INTERVAL
    # inputs, which is why every collapse unit above is exactly ONE
    # block (batch_size=None; blocks are contiguous by construction)
    # and never a bundle — Ray's streaming executor hands a map task
    # whichever blocks complete first, and a NON-consecutive bundle
    # lets the collapse merge an update onto a stale absolute across a
    # gap another batch owns, silently corrupting nullable columns
    # (observed on a 490-segment WAL at 32 cpus; preserve_order does
    # NOT prevent it — bundle composition is unordered either way).
    # The disjointness check verifies the invariant on every direct
    # tick before anything publishes.
    metrics = metrics_ds.to_pandas()  # one row per shard/task -- tiny
    if direct and len(metrics):
        _check_batch_intervals(metrics)
    if metrics.empty:
        if cfg.bad_record_policy != "quarantine":
            return None
        # with quarantine active, a segment can be consumed while
        # contributing ZERO valid rows (every record diverted); the
        # tick must still publish so committed_seq advances past it --
        # returning None here would re-read and re-quarantine the same
        # segment forever and stall every later segment behind it
        metrics = _empty_metrics()

    bucket_appends: list[tuple[str, str]] = []
    global_appends: list[str] = []
    if direct:
        global_appends = metrics["file"].dropna().tolist()
    else:
        bucket_appends = [(str(int(rec.bucket)), rec.file)
                          for rec in metrics.sort_values("shard").itertuples()]
    derived_appends: dict[str, list[str]] = {}
    if view_names and "derived_file" in metrics.columns:
        import json as _json
        for blob in metrics["derived_file"].tolist():
            if not blob:
                continue
            for view, fname in _json.loads(blob).items():
                derived_appends.setdefault(view, []).append(fname)

    committed = max(int(metrics["max_lsn"].max()) if len(metrics) else -1,
                    max(s.hi for s in segments), prev.committed_lsn)
    n_rejected = 0
    if cfg.bad_record_policy == "quarantine":
        import glob as _glob

        from ..stages.validate import QUARANTINE_SUBDIR
        n_rejected = sum(
            pq.read_metadata(p).num_rows for p in _glob.glob(os.path.join(
                cfg.table_dir, QUARANTINE_SUBDIR, f"dead-x{txn}-*.parquet")))
    manifest = _publish_append_rebased(state, cfg, prev_version, prev, _AppendTxn(
        txn_id=txn,
        num_buckets=cfg.num_buckets,
        bucket_appends=bucket_appends,
        global_appends=global_appends,
        derived_appends=derived_appends,
        new_control_ops=[c.to_dict() for c in new_controls],
        wal_consumed=[s.name for s in segments],
        committed_seq=max(s.seq for s in segments),
        committed_lsn=committed,
        schema_version=cfg.schema_version,
        metrics={
            "events_applied": int(metrics["events_in"].sum()),
            "records_written": int(metrics["records_out"].sum()),
            "deletes": int(metrics["n_delete"].sum()),
            "lag": int(wal.high_watermark(cfg.wal_dir) - committed),
            "events_rejected": n_rejected,
            "hot_convs": len(hot_convs or []),
            "per_bucket": metrics.groupby("bucket")["events_in"].sum().to_dict(),
        },
    ))
    return TickResult(manifest, int(metrics["events_in"].sum()),
                      int(metrics["records_out"].sum()), len(segments))


class _CountingCollapser(BatchCollapser):
    """Combiner that also tracks how many source events fold into each
    collapsed record (`_n`), so the applier can report true event
    throughput after pre-aggregation. With epoch barriers active, the
    counts group by (key, epoch) to match the finer collapse."""

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        if "_n" not in batch.columns:
            batch = batch.assign(_n=np.int64(1))
        keys = list(schemas.KEY_COLS)
        if self.barriers:
            batch = batch.assign(_epoch=np.searchsorted(
                np.asarray(self.barriers, dtype=np.int64),
                batch[schemas.LSN_COL].to_numpy(), side="right"))
            keys = keys + ["_epoch"]
        sums = batch.groupby(keys, sort=False, as_index=False)["_n"].sum()
        out = collapse_events(batch.drop(columns=["_n"]), self.payload_cols,
                              barriers=self.barriers)
        if self.barriers:
            out = out.assign(_epoch=np.searchsorted(
                np.asarray(self.barriers, dtype=np.int64),
                out[schemas.LSN_COL].to_numpy(), side="right"))
        out = out.merge(sums, on=keys, how="left")
        if self.barriers:
            out = out.drop(columns=["_epoch"])
        # hand Arrow blocks (no pandas metadata) to the shuffle
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)


# --------------------------------------------------------------------------
# snapshot read + compaction
# --------------------------------------------------------------------------
#
# Both fold the complete run set per BUCKET. Dataset.groupby would do a
# SORT-based all-to-all over every run row (measured 40s for 27M rows /
# 0.65 GB zstd at 32 cpus -- the sort, not the exchange, dominates);
# the runs are already collapsed per task, so all the fold needs is
# CO-LOCATION by the stored bucket key. A raw-Ray hash exchange does
# exactly that: one task per file chunk splits its rows by bucket
# (vectorized argsort + searchsorted, one object-store entry per
# (chunk, bucket)), one task per bucket concats its slices and folds.
# Same data movement, no global sort: 5.5s on the same input. This is
# the deliberate drop-below-Dataset case (a shared shuffle the Dataset
# API only expresses as a sort); partitioning assumption: bucket =
# H(key) % num_buckets is frozen per table (Manifest.num_buckets).


@ray.remote
def _split_run_files(file_chunk: list[str], num_buckets: int,
                     columns: list[str] | None = None,
                     bucket_subset: list[int] | None = None,
                     rebucket: bool = False):
    """Read a chunk of run files and return one Arrow table per bucket
    (num_returns = len(bucket_subset) or num_buckets at the call site).
    `columns` prunes the parquet scan; it is intersected per file with
    that file's schema (runs written before a column-add evolution lack
    the new column -- concat's promote null-fills it, same as the
    unpruned path). `bucket_subset` emits only those buckets' slices
    (wave compaction: rows outside the subset are dropped here, so the
    object count shrinks by the wave factor). `rebucket` recomputes the
    bucket column from the key hash under THIS `num_buckets` (the
    re-bucketing migration path) instead of trusting the stored one."""
    from ..stages.partition import hash_strings_arrow

    # run files are sorted by bucket, so when only a bucket subset is
    # wanted (and the stored bucket column is trusted), a parquet
    # row-group filter skips the untouched ranges at the scan
    filters = None if rebucket or bucket_subset is None \
        else [(BUCKET_COL, "in", list(bucket_subset))]

    def _read(p: str) -> pa.Table:
        if columns is None:
            return pq.read_table(p, filters=filters)
        have = set(pq.read_schema(p).names)
        return pq.read_table(p, columns=[c for c in columns if c in have],
                             filters=filters)
    tbl = pa.concat_tables([_read(p) for p in file_chunk],
                           promote_options="default")
    if rebucket:
        nb = (hash_strings_arrow(tbl["conv_id"]) % np.uint64(num_buckets)) \
            .astype(np.int32)
        tbl = tbl.set_column(tbl.schema.get_field_index(BUCKET_COL),
                             BUCKET_COL, pa.array(nb, type=pa.int32()))
    b = tbl[BUCKET_COL].to_numpy()
    order = np.argsort(b, kind="stable")
    tbl = tbl.take(pa.array(order))
    targets = np.arange(num_buckets, dtype=np.int64) \
        if bucket_subset is None else np.asarray(bucket_subset, dtype=np.int64)
    lo = np.searchsorted(b[order], targets, side="left")
    hi = np.searchsorted(b[order], targets + 1, side="left")
    parts = tuple(tbl.slice(l, h - l) for l, h in zip(lo, hi))
    return parts if len(targets) > 1 else parts[0]


@ray.remote
def _fold_bucket_refs(fn, *parts):
    """Concat a bucket's exchanged slices and apply the fold callable."""
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return fn(None)
    return fn(pa.concat_tables(parts, promote_options="default"))


@ray.remote
def _bucket_hist_of(path: str, num_buckets: int) -> np.ndarray:
    t = pq.read_table(path, columns=[BUCKET_COL])
    b = t[BUCKET_COL].to_numpy(zero_copy_only=False).astype(np.int64)
    b = b[(b >= 0) & (b < num_buckets)]
    return np.bincount(b, minlength=num_buckets)


def _bucket_rows_estimate(paths: list[str],
                          num_buckets: int) -> np.ndarray:
    """EXACT per-bucket input-row counts for the hot-bucket compaction
    salting gate: parallel tasks each scan ONE int column of their file
    (a few percent of the bytes the compaction itself is about to
    read) and return a num_buckets-sized histogram; the driver sums.
    Footer row-group stats cannot localize this — a default-sized row
    group spans every bucket, spreading the count uniformly."""
    if not paths:
        return np.zeros(num_buckets, dtype=np.int64)
    hists = ray.get([_bucket_hist_of.remote(p, num_buckets)
                     for p in paths])
    return np.sum(hists, axis=0).astype(np.int64)


def _exchange_by_bucket(paths: list[str], num_buckets: int,
                        target_chunk_bytes: int = 256 << 20,
                        columns: list[str] | None = None,
                        bucket_subset: list[int] | None = None,
                        rebucket: bool = False) -> list[list]:
    """Launch the split stage; returns per-bucket lists of table refs.

    Chunk size targets ~2 chunks per core (bounded above so a chunk's
    decompressed rows stay in one worker's heap); object count is
    chunks x buckets, each entry a contiguous Arrow slice."""
    total = sum(os.path.getsize(p) for p in paths)
    cpus = int(ray.cluster_resources().get("CPU", 8) or 8)
    target = max(8 << 20, min(target_chunk_bytes,
                              total // max(2 * cpus, 1) or total))
    chunks: list[list[str]] = []
    cur: list[str] = []
    size = 0
    for p in paths:
        cur.append(p)
        size += os.path.getsize(p)
        if size >= target:
            chunks.append(cur)
            cur, size = [], 0
    if cur:
        chunks.append(cur)
    n_out = num_buckets if bucket_subset is None else len(bucket_subset)
    outs = [_split_run_files.options(num_returns=n_out)
            .remote(c, num_buckets, columns, bucket_subset, rebucket)
            for c in chunks]
    if n_out == 1:
        outs = [[o] for o in outs]
    return [list(refs) for refs in zip(*outs)]


def read_snapshot(cfg: EngineConfig, manifest: Manifest | None = None,
                  final_only: bool = True,
                  columns: list[str] | None = None,
                  buckets: "list[int] | None" = None) -> ray.data.Dataset:
    """Dataset of the committed table state (LWW-resolved across runs).

    Grouping is by `bucket` (the stored layout key), which is stable
    across ticks even when the hot-key salt set changes.

    `columns` (payload subset) pushes projection down to the run-file
    parquet scan: only key cols, lsn/op/bucket and the requested
    payload columns are read and exchanged. Sound because the LWW fold
    resolves each payload column independently (a partial update's
    per-column ffill never looks at sibling columns). Unresolved
    control ops disable pruning for any column their predicates or
    assignments read, so a 2-of-7-column query over a wide transcript
    table scans ~2/7 of the bytes.

    `buckets` restricts the read to a subset of stored buckets (key
    pruning: only those buckets' base runs plus the uncompacted global
    runs are scanned, and the exchange emits only those groups). Sound
    because buckets partition keys exclusively — every record of a
    restricted key set lives inside its buckets' slices. This is the
    skipping read under `read_conversation` (one bucket) and the
    inverted-index search (index-hit buckets, matview.search_token).
    """
    from ..stages.controls import resolve_with_controls, sorted_controls

    state = TableState(cfg.table_dir)
    m = manifest or state.load_latest()
    if buckets is None:
        paths = state.run_paths(m)
    else:
        buckets = sorted({int(b) for b in buckets})
        want = {str(b) for b in buckets}
        paths = [os.path.join(state.runs_dir, f)
                 for b, runs in m.buckets.items() if b in want
                 for f in runs] \
            + [os.path.join(state.runs_dir, f) for f in m.global_runs]
        if not buckets:
            paths = []
    payload = schemas.payload_cols(cfg.schema_version)
    if not paths:
        empty = schemas.table_schema(cfg.schema_version).empty_table()
        if columns is not None:
            empty = empty.select([*schemas.KEY_COLS, *columns])
        return ray.data.from_arrow(empty)
    controls = sorted_controls(m.control_ops)

    scan_cols = None
    if columns is not None:
        unknown = [c for c in columns if c not in payload]
        if unknown:
            raise ValueError(f"unknown payload columns {unknown}")
        need = set(columns)
        for c in controls:
            need.add(c.predicate["col"])
            for out_col, spec in c.assignments.items():
                need.add(out_col)
                if "col" in spec:
                    need.add(spec["col"])
        payload = [c for c in payload if c in need]
        scan_cols = [*schemas.KEY_COLS, schemas.LSN_COL, schemas.OP_COL,
                     BUCKET_COL, *payload]

    final_cols = [*schemas.KEY_COLS,
                  *(payload if columns is None else columns)]
    target = schemas.table_schema(cfg.schema_version)

    def _empty_run_frame() -> pd.DataFrame:
        # typed empty RUN-shaped frame so an empty bucket resolves
        # through the exact same code path (and thus schema) as an
        # occupied one -- mismatched per-block schemas break unions
        cols = {BUCKET_COL: pd.Series(dtype="int32")}
        for f in target:
            if f.name in schemas.KEY_COLS or f.name in payload:
                cols[f.name] = pd.Series(
                    dtype=object if pa.types.is_string(f.type)
                    else f.type.to_pandas_dtype())
        cols[schemas.LSN_COL] = pd.Series(dtype="int64")
        cols[schemas.OP_COL] = pd.Series(dtype=object)
        return pd.DataFrame(cols)

    def resolve(group: "pa.Table | None") -> pa.Table:
        g = _empty_run_frame() if group is None or group.num_rows == 0 \
            else group.to_pandas()
        out = resolve_with_controls(g, payload, controls) if controls \
            else resolve_final(g, payload)
        if final_only:
            out = out[final_cols]
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    # the exchange splits by the STORED layout: the manifest's bucket
    # count, never the config's (a reader with a stale cfg after a
    # re-bucketing migration would otherwise silently drop every row
    # whose bucket >= cfg.num_buckets)
    per_bucket = _exchange_by_bucket(paths, m.num_buckets or cfg.num_buckets,
                                     columns=scan_cols,
                                     bucket_subset=buckets)
    refs = [_fold_bucket_refs.remote(resolve, *bucket_refs)
            for bucket_refs in per_bucket]
    return ray.data.from_arrow_refs(refs)


def read_conversation(cfg: EngineConfig, conv_id: str,
                      manifest: Manifest | None = None) -> pd.DataFrame:
    """Point lookup (the serving path): resolve ONE conversation's
    final turns by scanning only its hash bucket -- the read-side
    payoff of the persisted `bucket = H(conv_id) % num_buckets`
    layout. Touches the bucket's base runs plus the not-yet-compacted
    global runs, and within those the scan filter (bucket == b AND
    conv_id == id) prunes parquet row groups via footer statistics
    (runs are written sorted by bucket/key-hash precisely so point
    predicates skip row groups). Cost is O(one bucket's bytes)
    regardless of table size; at 100 TB with thousands of buckets
    that is the difference between a serving query and a table scan.
    Resolution (LWW fold + pending control ops + tombstone drop +
    turn_idx ordering) is identical to `read_snapshot`."""
    import pyarrow.dataset as pads

    from ..stages.controls import resolve_with_controls, sorted_controls

    state = TableState(cfg.table_dir)
    m = manifest or state.load_latest()
    nb = m.num_buckets or cfg.num_buckets
    bucket = int(hash_strings_arrow(pa.array([conv_id], pa.string()))[0]
                 % np.uint64(nb))
    payload = schemas.payload_cols(cfg.schema_version)
    final_cols = [*schemas.KEY_COLS, *payload]
    files = list(m.buckets.get(str(bucket), [])) + list(m.global_runs)
    if not files:
        return schemas.table_schema(cfg.schema_version).empty_table() \
            .to_pandas()[final_cols]
    paths = [os.path.join(state.runs_dir, f) for f in files]
    scan_schema = pa.schema([
        pa.field(BUCKET_COL, pa.int32()),
        *schemas.table_schema(cfg.schema_version),
        pa.field(schemas.LSN_COL, pa.int64()),
        pa.field(schemas.OP_COL, pa.string()),
    ])
    flt = (pads.field(BUCKET_COL) == bucket) \
        & (pads.field("conv_id") == conv_id)
    t = pads.dataset(paths, format="parquet", schema=scan_schema) \
        .to_table(filter=flt)
    controls = sorted_controls(m.control_ops)
    g = t.to_pandas()
    if not len(g):
        return schemas.table_schema(cfg.schema_version).empty_table() \
            .to_pandas()[final_cols]
    out = resolve_with_controls(g, payload, controls) if controls \
        else resolve_final(g, payload)
    return out[final_cols].sort_values("turn_idx", ignore_index=True)


def read_snapshot_as_of(cfg: EngineConfig, version: int,
                        final_only: bool = True) -> ray.data.Dataset:
    """TIME TRAVEL: the table exactly as manifest `version` committed it.

    Manifests are immutable and name their run files, so any retained
    version is readable; the read honors the VERSION'S schema_version
    and num_buckets (not the current config's), so it works across
    schema evolution and is safe against layout drift. Retention is
    bounded by `cfg.gc_keep_versions` (the post-compaction GC deletes
    files only unreferenced by that window) -- a reader pinned to an
    old version within the window never sees files vanish.
    """
    from dataclasses import replace

    state = TableState(cfg.table_dir)
    m = state.load(version)
    cfg_v = replace(cfg,
                    schema_version=m.schema_version or cfg.schema_version,
                    num_buckets=m.num_buckets or cfg.num_buckets)
    return read_snapshot(cfg_v, manifest=m, final_only=final_only)


def read_delta(cfg: EngineConfig, from_version: int,
               to_version: int | None = None) -> ray.data.Dataset:
    """CDC OUT: the collapsed change records committed AFTER manifest
    `from_version` up to `to_version` (default latest) -- the lake
    table as a change SOURCE for downstream consumers (the reference's
    stream-on-table read, S8, re-exported at the snapshot level).

    Each manifest names its run files, so the delta is exactly the run
    files referenced by (from_version, to_version] manifests and not by
    `from_version`; rows carry (op, lsn) so a consumer can apply its
    own fold. Compactions rewrite history (their manifests reference
    replacement files, not new changes), so the window must not span
    one -- detected via the `compaction` metric and rejected."""
    state = TableState(cfg.table_dir)
    hi = to_version if to_version is not None else state.latest_version()
    if hi is None or hi < from_version:
        raise ValueError(f"bad version window ({from_version}, {hi}]")
    base = set(state.load(from_version).table_run_files()) \
        if from_version >= 0 else set()
    new_files: list[str] = []
    for v in range(from_version + 1, hi + 1):
        m = state.load(v)
        if m.metrics.get("compaction"):
            raise ValueError(
                f"version window ({from_version}, {hi}] spans compaction "
                f"v{v}; deltas are only defined between compactions")
        if m.metrics.get("rollback_to") is not None:
            raise ValueError(
                f"version window ({from_version}, {hi}] spans rollback "
                f"v{v}; a restore rewrites visible history, so the "
                f"window's file lineage is not a change stream")
        if m.metrics.get("erasure") is not None:
            raise ValueError(
                f"version window ({from_version}, {hi}] spans erasure "
                f"v{v}; an erasure rewrites files without emitting "
                f"change records (and replicating them would "
                f"re-export the erased rows)")
        new_files.extend(f for f in m.table_run_files()
                         if f not in base and f not in new_files)
    if not new_files:
        return ray.data.from_arrow(
            schemas.table_schema(cfg.schema_version).empty_table())
    return ray.data.read_parquet(
        [os.path.join(state.runs_dir, f) for f in new_files])


def replicate_delta(cfg_src: EngineConfig, cfg_dst: EngineConfig,
                    from_version: int,
                    to_version: int | None = None) -> Manifest | None:
    """Table-to-table replication (downstream materialization): apply
    one table's committed delta window to another table as a single
    destination transaction -- cascaded CDC, the lake analogue of the
    reference's stream-on-table feeding a second sink
    (`stream/Main.scala:16-19`, `DQOrderPaidMoreThanPrice.scala:20-53`
    chain raw->flat->derived tables the same way).

    The delta does NOT pass through the destination's WAL: a WAL is a
    strictly-ordered producer log (disjoint ascending lsn intervals),
    while a replicated window legitimately contains historical lsns
    (duplicate re-deliveries collapsed into upstream runs). Instead
    the window re-normalizes and re-partitions under the DESTINATION's
    schema version and bucket layout, lands as ordinary delta runs,
    and commits in one manifest publish (metrics record the source
    window for lineage). Resolution is LWW by the ORIGINAL lsns, so
    replication is idempotent: re-applying a window adds runs whose
    (key, lsn) records fold to the identical resolved state, and the
    next compaction absorbs the duplicates. The destination's own
    committed_seq is untouched (its WAL position is independent)."""
    ds = read_delta(cfg_src, from_version, to_version)
    cfg_dst.ensure_dirs()
    state = TableState(cfg_dst.table_dir)
    prev_version, prev = state.load_latest_versioned()
    _check_bucket_layout(prev, cfg_dst)
    txn = state.new_txn()
    normalizer = SchemaNormalizer(
        schemas.table_schema(cfg_dst.schema_version),
        keep_extra=_BOOKKEEPING)
    partitioner = Partitioner(cfg_dst.num_buckets, 1, None,
                              include_key_hash=True)
    # fold=False: the window's records are already collapsed by the
    # SOURCE's folds, and their lsn intervals interleave arbitrarily
    # across files — Ray's rebatching does not preserve any interval
    # discipline here, so re-folding could collapse a FULL over a gap
    # whose PARTIAL sits in a sibling batch and mask it at read time.
    # Pass-through is immutable under any bundling; the destination's
    # read-time LWW fold resolves the exact state.
    applier = DirectApplier(
        runs_dir=state.runs_dir, txn_id=txn,
        payload_cols=schemas.payload_cols(cfg_dst.schema_version),
        pre_stages=(normalizer, partitioner), fold=False)
    metrics = ds.map_batches(applier, batch_format="pyarrow",
                             batch_size=cfg_dst.direct_batch_rows,
                             zero_copy_batch=True).to_pandas()
    if "file" not in metrics.columns:
        # a zero-block delta window (no new versions, or manifests that
        # added no files) yields a columnless empty frame from Ray
        return None
    metrics = metrics.dropna(subset=["file"])
    if metrics.empty:
        return None
    # committed_lsn stays the DESTINATION's own watermark: the source's
    # lsns are a different domain (importing them would poison the
    # replica's lag metric and its control-op positioning if it also
    # ingests its own WAL -- a replica mixing domains is on the user,
    # but the engine must not corrupt its own bookkeeping)
    # consumes_wal=False: a replicated window is seq-independent, so it
    # commutes even with a concurrent WAL-consuming tick on the
    # destination (both are pure delta appends; LWW resolves by lsn)
    return _publish_append_rebased(state, cfg_dst, prev_version, prev, _AppendTxn(
        txn_id=txn, num_buckets=cfg_dst.num_buckets,
        bucket_appends=[], global_appends=metrics["file"].tolist(),
        derived_appends={}, new_control_ops=[],
        wal_consumed=[], committed_seq=prev.committed_seq,
        committed_lsn=prev.committed_lsn,
        schema_version=cfg_dst.schema_version,
        consumes_wal=False,
        metrics={"replicated_from": {
                     "table_dir": cfg_src.table_dir,
                     "versions": [from_version, to_version]},
                 "events_applied": int(metrics["events_in"].sum()),
                 "records_written": int(metrics["records_out"].sum()),
                 "lag": 0}))


def rollback(cfg: EngineConfig, to_version: int,
             rewind_stream: bool = False) -> Manifest:
    """RESTORE the table to a prior committed version, as a NEW commit
    (the lake analogue of time travel made writable: Delta RESTORE /
    Snowflake UNDROP-style administrative recovery — the reference
    delegates this to the warehouse; here it is one manifest publish).

    Manifests are immutable and name their run files, so restoring is
    pure metadata: the new version re-points at `to_version`'s exact
    file set (table runs, derived sinks, pending control ops, schema
    and bucket layout). Nothing is rewritten, nothing rewinds history
    — lineage keeps every intermediate version, and the restored files
    become referenced by LATEST again, which re-protects them from GC.
    Only versions still inside the GC retention window are restorable;
    a version whose files were swept raises before publishing.

    Stream-offset semantics (the CDC-specific design point):

    * ``rewind_stream=False`` (default, RESTORE): the WAL offset stays
      at the CURRENT watermark — the undone ticks' effects are dropped
      from the table and will NOT be re-consumed. Use for "a bad
      control op / bad import landed; discard it".
    * ``rewind_stream=True`` (REWIND): ``committed_seq`` also rewinds
      to the target's, so the next tick RE-CONSUMES every WAL segment
      after it. The LWW fold is idempotent, so replay converges to the
      pre-rollback state — use for "reprocess the window with fixed
      code/config" (the classic Kafka offset-rewind move, S7/ST2's
      offset contract made user-drivable).

    Strict CAS, no rebase: an administrative restore racing a live
    writer must fail loudly (`CommitConflict`), not auto-merge.

    Downstream readers that walk file lineage treat the rollback
    commit as a history rewrite, exactly like compaction: matview
    refreshes fall back to a full recompute and `read_delta` refuses
    windows spanning it."""
    state = TableState(cfg.table_dir)
    prev_version, prev = state.load_latest_versioned()
    if prev_version is None:
        raise ValueError("cannot roll back a table with no commits")
    if not 0 <= to_version <= prev_version:
        raise ValueError(f"rollback target v{to_version} out of range "
                         f"[0, {prev_version}]")
    # an erasure is a FLOOR: restoring a pre-erasure version would
    # resurrect physically-erased rows from still-retained files,
    # silently undoing a right-to-be-forgotten action
    for v in range(to_version + 1, prev_version + 1):
        mv = state.load(v)
        if mv.metrics.get("erasure") is not None:
            who = mv.metrics["erasure"].get("conv_ids",
                                            mv.metrics["erasure"]
                                            .get("conv_id"))
            raise ValueError(
                f"cannot roll back to v{to_version} across the "
                f"erasure committed at v{v} ({who!r}): erased "
                f"data must not resurrect; re-apply the erasure on "
                f"the restored state instead")
    target = state.load(to_version)
    missing = [f for f in target.run_files()
               if not state.storage.exists(os.path.join(state.runs_dir, f))]
    if missing:
        raise ValueError(
            f"version {to_version} left the GC retention window "
            f"(cfg.gc_keep_versions); missing run files e.g. {missing[:3]}")
    m = Manifest(
        txn_id=state.new_txn(),
        committed_seq=target.committed_seq if rewind_stream
        else prev.committed_seq,
        committed_lsn=target.committed_lsn,
        schema_version=target.schema_version,
        num_buckets=target.num_buckets,
        buckets={b: list(fs) for b, fs in target.buckets.items()},
        global_runs=list(target.global_runs),
        derived={k: list(fs) for k, fs in target.derived.items()},
        control_ops=[dict(op) for op in target.control_ops],
        wal_consumed=[],
        metrics={"rollback_to": to_version,
                 "rollback_mode": "rewind" if rewind_stream else "restore"})
    return state.publish(m, expected_parent=prev_version)


def clone_table(cfg_src: EngineConfig, cfg_dst: EngineConfig,
                version: int | None = None) -> Manifest:
    """ZERO-COPY CLONE of a committed version into a new table dir
    (Snowflake ``CREATE TABLE .. CLONE`` / Iceberg branch semantics —
    warehouse-side in the reference, one metadata commit here).

    Run files are immutable, so the clone shares them by reference:
    each file is linked (`storage.link_or_copy`: hardlink locally,
    server-side COPY on object stores) under the destination's
    ``runs/`` namespace and the destination publishes a v0 manifest
    with the source version's exact content — data, derived sinks,
    pending control ops, schema version, bucket layout AND stream
    offsets. From that point the two tables are fully independent:
    either side's writes, compactions and GC touch only its own
    references (hardlinks are independent inode refs; deleting one
    name never affects the other).

    The cloned ``committed_seq`` makes the CDC story composable: point
    the clone's config at the SAME WAL and it resumes consuming
    exactly where the source left off (dev/test forks of a live
    table); point it at its own WAL for a frozen fork."""
    src = TableState(cfg_src.table_dir)
    v = version if version is not None else src.latest_version()
    if v is None:
        raise ValueError("source table has no committed version to clone")
    if os.path.abspath(cfg_dst.table_dir) == os.path.abspath(
            cfg_src.table_dir):
        raise ValueError("clone destination must be a different table_dir")
    m = src.load(v)
    cfg_dst.ensure_dirs()
    dst = TableState(cfg_dst.table_dir)
    if dst.latest_version() is not None:
        raise ValueError(
            f"clone destination {cfg_dst.table_dir} already has commits")
    for f in m.run_files():
        try:
            dst.storage.link_or_copy(os.path.join(src.runs_dir, f),
                                     os.path.join(dst.runs_dir, f))
        except FileNotFoundError:
            raise ValueError(
                f"source version {v} left the GC retention window "
                f"(missing run file {f})")
    clone = Manifest(
        txn_id=dst.new_txn(),
        committed_seq=m.committed_seq,
        committed_lsn=m.committed_lsn,
        schema_version=m.schema_version,
        num_buckets=m.num_buckets,
        buckets={b: list(fs) for b, fs in m.buckets.items()},
        global_runs=list(m.global_runs),
        derived={k: list(fs) for k, fs in m.derived.items()},
        control_ops=[dict(op) for op in m.control_ops],
        wal_consumed=[],
        metrics={"cloned_from": {"table_dir": cfg_src.table_dir,
                                 "version": v}})
    return dst.publish(clone, expected_parent=None)


@ray.remote
def _erase_from_file(path: str, out_path: str, conv_ids: "list[str]"
                     ) -> "tuple[int, int] | None":
    """Rewrite one immutable file without the keys' rows. Returns
    (kept, removed), or None when the file contains none of the keys
    (probe reads only the conv_id column; the original stays shared).
    Single-threaded read: parallelism is the per-file task fan-out."""
    keys = pa.array(conv_ids, pa.string())
    probe = pq.read_table(path, columns=["conv_id"],
                          use_threads=False)
    hit = pc.sum(pc.cast(pc.is_in(probe["conv_id"], value_set=keys),
                         pa.int64())).as_py() or 0
    if not hit:
        return None
    t = pq.read_table(path, use_threads=False)
    # null-keyed rows (matview epoch markers) are NOT the erased keys:
    # keep them (a null membership would filter-drop otherwise)
    kept = t.filter(pc.fill_null(
        pc.invert(pc.is_in(t["conv_id"], value_set=keys)), True))
    tmp = out_path + f".tmp-{uuid.uuid4().hex[:8]}"
    pq.write_table(kept, tmp, compression="zstd")
    os.replace(tmp, out_path)
    return kept.num_rows, t.num_rows - kept.num_rows


@ray.remote
def _scrub_segment(path: str, conv_ids: "list[str]") -> int:
    """In-place WAL-segment scrub (atomic same-name replace: the
    name's lsn interval stays a valid superset bound). Probe-gated:
    segments without the keys are untouched. Returns rows removed."""
    if "conv_id" not in pq.read_schema(path).names:
        return 0                  # e.g. a staged-source side file
    keys = pa.array(conv_ids, pa.string())
    probe = pq.read_table(path, columns=["conv_id"], use_threads=False)
    hit = pc.sum(pc.cast(pc.is_in(probe["conv_id"], value_set=keys),
                         pa.int64())).as_py() or 0
    if not hit:
        return 0
    t = pq.read_table(path, use_threads=False)
    kept = t.filter(pc.fill_null(
        pc.invert(pc.is_in(t["conv_id"], value_set=keys)), True))
    tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
    pq.write_table(kept, tmp, compression="zstd")
    os.replace(tmp, path)
    return t.num_rows - kept.num_rows


def erase_conversation(cfg: EngineConfig, conv_id: str,
                       scrub_wal: bool = False) -> Manifest:
    """Single-key convenience over :func:`erase_conversations`."""
    return erase_conversations(cfg, [conv_id], scrub_wal=scrub_wal)


def erase_conversations(cfg: EngineConfig, conv_ids: "list[str]",
                        scrub_wal: bool = False) -> Manifest:
    """PHYSICAL ERASURE of a batch of conversations (GDPR/right-to-be-
    forgotten — the op a transcript lake must have; a tombstone delete
    only hides rows, this removes their bytes). Cost is
    affected-bucket-proportional, never table-proportional: the keys'
    hash buckets name the only base runs that can hold them, so the
    rewrite set is those buckets' runs, the uncompacted global runs,
    and any derived-sink files carrying a conv_id column (keyed
    matviews, additive sinks) — and a BATCH rewrites each affected
    file once for the whole key set (erasure requests arrive in
    batches; N keys must not mean N rewrites of a shared bucket).
    Files containing none of the keys are NOT rewritten (cheap column
    probe) and stay byte-shared with prior versions/clones.

    The rewrite commits as one strict-CAS manifest (same atomicity as
    everything else); old files become unreferenced and age out via GC
    — full physical purge completes when the retention window passes
    (`gc_keep_versions`), the standard lakehouse erasure contract.
    Lineage-walking readers treat the commit as a history rewrite
    (matviews full-recompute, `read_delta` refuses spanning windows).

    The UNCONSUMED WAL tail is always scrubbed (in-place atomic
    same-name rewrites, probe-gated, task-parallel): segments the
    table hasn't ticked yet would otherwise re-insert the key at the
    very next tick. `scrub_wal=True` extends the scrub to CONSUMED
    history too — without it, a bootstrap replay of the old segments
    by another consumer could resurrect the conversation from the
    log. Derived files that cannot be row-filtered (no conv_id
    column: the token index, grouped/windowed aggregates) are
    INVALIDATED instead — dropped from the manifest (GC collects the
    bytes) and rebuilt by their next refresh, which the erasure guard
    forces to a full recompute over the erased table. A rollback
    across the erasure and a rebase onto it are both refused.

    Caveats a deployment must own: clones made BEFORE the erasure
    still share the old bytes (erase them separately), and replicas
    fed by `replicate_delta` windows that predate it must be erased
    downstream too."""
    if not conv_ids:
        raise ValueError("empty erasure batch")
    conv_ids = sorted(set(conv_ids))
    state = TableState(cfg.table_dir)
    # Losing the strict-CAS version race must not abandon the erasure:
    # the unconsumed WAL tail is scrubbed BEFORE each publish attempt
    # (see below), so an abandoned attempt would leave the
    # conversations in the table with their in-flight WAL updates
    # already destroyed and no erasure recorded. Retry internally --
    # reload state, re-check guards, re-run the (idempotent) rewrite
    # against the new latest -- instead of relying on the caller.
    for attempt in range(max(0, cfg.commit_retries) + 1):
        try:
            return _erase_attempt(cfg, state, conv_ids, scrub_wal)
        except CommitConflict:
            if attempt >= cfg.commit_retries:
                raise
    raise AssertionError("unreachable")


def _erase_attempt(cfg: EngineConfig, state: TableState,
                   conv_ids: "list[str]", scrub_wal: bool) -> Manifest:
    """One CAS attempt of :func:`erase_conversations`: rewrite against
    the current latest and publish strictly on it."""
    prev_version, prev = state.load_latest_versioned()
    if prev_version is None:
        raise ValueError("cannot erase from a table with no commits")
    nb = prev.num_buckets or cfg.num_buckets
    kh = hash_strings_arrow(pa.array(conv_ids, pa.string()))
    affected = {str(int(b)) for b in (kh % np.uint64(nb))}
    txn = state.new_txn()

    def out_name(f: str) -> str:
        return f"{os.path.splitext(f)[0]}-er{txn}.parquet"

    # candidates: the keys' bucket base runs + global runs + derived
    # files that carry the conv_id key (row-filterable). Per derived
    # CLASS (decided by registry/prefix, never by reading footers):
    #   mv:/jmv: -- keyed by conv_id by construction: REWRITE.
    #   gmv:     -- grouped aggregates may embed the erased text's
    #               CONTENT (the token index literally stores its
    #               vocabulary) and no row filter names the keys'
    #               share; they are recomputable from the table, so
    #               INVALIDATE (drop from the manifest; files age out
    #               via GC; the next refresh is a forced-full rebuild
    #               over the already-erased table).
    #   additive sinks -- fed only by per-tick WAL deltas with NO
    #               recompute path; the conv_id-keyed ones REWRITE,
    #               the rest (role-level counters: numeric aggregates,
    #               no row content) are RETAINED -- dropping them
    #               would permanently destroy unrelated state.
    candidates = [*(f for b in sorted(affected)
                    for f in prev.buckets.get(b, [])),
                  *prev.global_runs]
    refs = {f: _erase_from_file.remote(
                os.path.join(state.runs_dir, f),
                os.path.join(state.runs_dir, out_name(f)), conv_ids)
            for f in candidates}
    from .derived import VIEWS
    drefs = {}
    invalidated = []
    retained = []
    derived_new: dict = {}
    for k, fs in prev.derived.items():
        if k.startswith("gmv:"):
            invalidated.append(k)
            continue
        if k.startswith(("mv:", "jmv:")):
            keyed = True
        else:
            keyed = k in VIEWS and VIEWS[k].key == "conv_id"
        if not keyed:
            retained.append(k)
            derived_new[k] = list(fs)
            continue
        derived_new[k] = list(fs)
        for f in fs:
            drefs[f] = _erase_from_file.remote(
                os.path.join(state.runs_dir, f),
                os.path.join(state.runs_dir, out_name(f)), conv_ids)
    results = {f: r for f, r in zip(refs, ray.get(list(refs.values())))}
    dresults = {f: r for f, r in zip(drefs, ray.get(list(drefs.values())))}

    def remap(files: "list[str]", res: dict) -> "list[str]":
        return [out_name(f) if res.get(f) is not None else f
                for f in files]

    rows_erased = sum(r[1] for r in results.values() if r) \
        + sum(r[1] for r in dresults.values() if r)
    rewritten = sum(1 for r in (*results.values(), *dresults.values())
                    if r)
    m = Manifest(
        txn_id=txn,
        committed_seq=prev.committed_seq,
        committed_lsn=prev.committed_lsn,
        schema_version=prev.schema_version,
        num_buckets=prev.num_buckets,
        buckets={b: remap(fs, results) if b in affected else list(fs)
                 for b, fs in prev.buckets.items()},
        global_runs=remap(prev.global_runs, results),
        derived={k: remap(fs, dresults) for k, fs in derived_new.items()},
        control_ops=[op for op in prev.control_ops],
        wal_consumed=[],
        metrics={"erasure": {"conv_ids": conv_ids,
                             "files_rewritten": rewritten,
                             "rows_erased": int(rows_erased),
                             "views_invalidated": sorted(invalidated),
                             "views_retained_aggregate": sorted(retained),
                             "wal_scrubbed": bool(scrub_wal)}})
    # resurrection guard, BEFORE the publish: WAL segments the table
    # has NOT consumed yet would re-insert the keys at the very next
    # tick (committed_seq is untouched by erasure), and scrubbing
    # after the commit would leave a crash window where the erasure is
    # durable but the tail still holds the keys. Scrub-first is safe:
    # if the publish then fails, the WAL merely lost rows the caller
    # asked to erase (over-deletion without a commit; the retry
    # completes the commit), never the reverse. `scrub_wal=True`
    # extends the scrub to consumed history (bootstrap replays /
    # offset rewinds of other consumers). Probe-gated and
    # task-parallel, same shape as the run-file rewrite.
    segs = [s for s in wal.list_segments(cfg.wal_dir)
            if scrub_wal or s.seq > prev.committed_seq]
    if segs:
        ray.get([_scrub_segment.remote(s.path, conv_ids) for s in segs])
    return state.publish(m, expected_parent=prev_version)


def snapshot_diff(cfg: EngineConfig, v_from: int, v_to: int | None = None,
                  num_partitions: int = 16) -> ray.data.Dataset:
    """Semantic diff of two committed snapshots: one row per key whose
    visible state differs, labeled added / removed / changed. Works
    across compactions (it compares RESOLVED states, not file lineage
    -- the complement of :func:`read_delta`). Both snapshots hash-route
    by key and each partition diffs its keys in one vectorized merge."""
    from ..stages.exchange import exchange_map_groups

    state = TableState(cfg.table_dir)
    v_hi = v_to if v_to is not None else state.latest_version()
    if v_hi is None:
        raise ValueError("no committed snapshot")
    payload = schemas.payload_cols(cfg.schema_version)
    keys = list(schemas.KEY_COLS)

    def side(tag: int):
        def f(batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            # evolution alignment: a snapshot committed under an older
            # schema lacks later-added columns; null-fill so the merge
            # always sees both suffixed sides (an added column counts
            # as "changed" wherever the new side is non-null)
            for c in payload:
                if c not in df.columns:
                    df[c] = None
            df = df[keys + payload]
            df["side"] = np.int8(tag)
            kh = hash_strings_arrow(batch["conv_id"]) \
                + df["turn_idx"].to_numpy().astype(np.uint64)
            df["part"] = (kh % np.uint64(num_partitions)).astype(np.int32)
            return df
        return f

    a = read_snapshot_as_of(cfg, v_from).map_batches(
        side(0), batch_format="pyarrow", zero_copy_batch=True)
    b = read_snapshot_as_of(cfg, v_hi).map_batches(
        side(1), batch_format="pyarrow", zero_copy_batch=True)

    def diff_part(g: pd.DataFrame) -> pd.DataFrame:
        old = g[g["side"] == 0]
        new = g[g["side"] == 1]
        m = old.merge(new, on=keys, how="outer", suffixes=("_a", "_b"),
                      indicator=True)
        change = np.where(m["_merge"] == "left_only", "removed",
                          np.where(m["_merge"] == "right_only", "added",
                                   "changed"))
        same = np.ones(len(m), dtype=bool)
        both = (m["_merge"] == "both").to_numpy()
        for c in payload:
            ca, cb = m[f"{c}_a"], m[f"{c}_b"]
            same &= (ca.eq(cb) | (ca.isna() & cb.isna())).to_numpy()
        keep = ~(both & same)
        out = m.loc[keep, keys].copy()
        out["change"] = change[keep]
        return out

    return exchange_map_groups(a.union(b), "part", num_partitions, diff_part)


def snapshot_to_pandas(cfg: EngineConfig) -> pd.DataFrame:
    """Small-scale convenience (tests): full snapshot, stable ordering."""
    df = read_snapshot(cfg).to_pandas()
    if df.empty and not len(df.columns):
        # Ray's to_pandas drops the schema of a fully-empty Dataset;
        # restore the typed empty frame (legitimately-empty tables
        # exist: e.g. every record quarantined)
        df = schemas.table_schema(cfg.schema_version).empty_table() \
            .to_pandas()
    return df.sort_values(list(schemas.KEY_COLS), kind="stable", ignore_index=True)


def read_derived(cfg: EngineConfig, view: str = DERIVED_CONV_STATS,
                 num_partitions: int = 32) -> ray.data.Dataset:
    """Resolved state of a named derived view: distributed associative
    merge of its additive partials per the registry's merge_spec."""
    from ray.data.aggregate import Max, Min, Sum

    from .derived import VIEWS

    spec = VIEWS[view]
    state = TableState(cfg.table_dir)
    paths = state.derived_paths(view)
    if not paths:
        cols = {spec.key: pa.array([], pa.string())}
        for c, _fn in spec.merge_spec:
            cols[c] = pa.array([], pa.int64())
        return ray.data.from_arrow(pa.table(cols))
    aggs = {"sum": Sum, "max": Max, "min": Min}
    ds = ray.data.read_parquet(paths)
    return ds.groupby(spec.key, num_partitions=num_partitions).aggregate(
        *[aggs[fn](c, alias_name=c) for c, fn in spec.merge_spec])


def _compact_derived(state: TableState, prev: Manifest, txn: str) -> dict[str, list[str]]:
    """Fold each derived view's partials into a base set (one file, or
    one per hash partition for views past the distribution gate)."""
    from .derived import compact_additive_files

    from .matview import GMV_PREFIX, MV_PREFIX, compact_gmv_files, \
        compact_mv_files

    out: dict[str, list[str]] = {}
    for view, files in prev.derived.items():
        if not files:
            continue
        if view.startswith(MV_PREFIX):
            # materialized views are LWW-versioned, not additive: fold
            # latest-wins (tombstones fall away with the rows they mask)
            out[view] = compact_mv_files(state.runs_dir, view, files,
                                         txn)
            continue
        if view.startswith(GMV_PREFIX):
            # grouped matviews: keep each bucket's newest epoch
            out[view] = compact_gmv_files(state.runs_dir, view, files,
                                          txn)
            continue
        if view.startswith("jmv:"):
            # cross-table join views: latest-wins fold preserving the
            # two-sided (versionA, versionB) refresh watermark
            from .joinview import compact_jmv_files
            out[view] = compact_jmv_files(state.runs_dir, view, files,
                                          txn)
            continue
        # additive views: size-gated associative merge (key-routed
        # exchange past SMALL_VIEW_BYTES — see derived.py)
        out[view] = compact_additive_files(state.runs_dir, view, files,
                                           txn)
    return out


def compact(cfg: EngineConfig, waves: int = 1,
            rebucket: bool = False) -> Manifest | None:
    """Fold every bucket's runs into base runs (one file per bucket —
    or `max(2, salt_factor)` key-exclusive sub-shard files for a
    measured HOT bucket, see cfg.compact_salt_rows — each sorted by
    (conv_id, turn_idx), the reference's 'stable turn ordering'
    invariant), drop tombstones, publish a new manifest.

    Safe because compaction folds a bucket's COMPLETE run list and no
    event at lsn <= committed can ever be re-applied (checkpoint rule).

    `waves` > 1 compacts the buckets in that many sequential waves:
    each wave re-reads the run files but emits only its own buckets'
    slices, cutting the exchange's peak object count (and in-flight
    bytes) by the wave factor at the cost of waves-fold re-reads --
    the lever for a pathological backlog (months of uncompacted runs)
    whose full exchange would flood the object store. All waves'
    bases publish in ONE manifest, so atomicity/exactly-once are
    untouched (a crash mid-waves leaves only GC-sweepable orphans).

    `rebucket` is the bucket-count MIGRATION path: rows are re-routed
    by H(conv_id) % cfg.num_buckets during the exchange (stored bucket
    values are recomputed, not trusted) and the manifest commits the
    new count, so a table laid out under an old num_buckets moves to
    the config's value in one atomic compaction -- the explicit
    operation the layout guard (`_check_bucket_layout`) points at.
    LWW safety is preserved because the fold still sees every record
    of a key in exactly one (new) bucket group.
    """
    from ..stages.controls import resolve_with_controls, sorted_controls

    state = TableState(cfg.table_dir)
    prev_version, prev = state.load_latest_versioned()
    if not prev.buckets and not prev.global_runs:
        return None
    if not rebucket:
        _check_bucket_layout(prev, cfg)
    payload = schemas.payload_cols(cfg.schema_version)
    txn = state.new_txn()
    runs_dir = state.runs_dir

    # absorb control ops the committed watermark covers (their effects
    # land in the compacted bases and the ops leave the manifest);
    # future-dated ops must wait for their position's events
    controls = sorted_controls(prev.control_ops)
    absorb = [c for c in controls if c.lsn <= prev.committed_lsn]
    keep_ops = [c.to_dict() for c in controls if c.lsn > prev.committed_lsn]

    cols = RUN_COLS_FIXED + payload

    def compact_bucket(group: "pa.Table | None",
                       shard: "int | None" = None) -> "dict | None":
        if group is None or group.num_rows == 0:
            return None
        bucket = group[BUCKET_COL][0].as_py()
        if absorb:
            resolved = resolve_with_controls(
                group.select(cols).to_pandas(), payload, absorb, sort=False)
            out = pa.Table.from_pandas(resolved[cols], preserve_index=False) \
                .replace_schema_metadata(None)
        else:
            out = fold_table(group.select(cols), payload)
        out = out.filter(pc.invert(pc.equal(out[schemas.OP_COL],
                                            schemas.OP_DELETE)))
        # the user-visible stable (conv_id, turn_idx) ordering lives in
        # the compacted base runs
        out = out.take(pc.sort_indices(out, sort_keys=[
            ("conv_id", "ascending"), ("turn_idx", "ascending")]))
        sfx = "" if shard is None else f"-s{shard:02d}"
        fname = f"base-b{bucket:05d}{sfx}-x{txn}.parquet"
        tmp = os.path.join(runs_dir, fname + f".tmp-{uuid.uuid4().hex[:8]}")
        pq.write_table(out, tmp, compression="zstd")
        os.replace(tmp, os.path.join(runs_dir, fname))
        return {"bucket": int(bucket), "file": fname, "rows": out.num_rows}

    def sub_fold(shard: int, n_shards: int):
        # key-exclusive sub-shard of a HOT bucket's fold: the full PK
        # (conv_id, turn_idx) determines the shard via the same
        # multiplicative turn hash the apply-stage salt uses, so every
        # record of a key folds in exactly one sub-task
        def fold(group: "pa.Table | None") -> "dict | None":
            if group is None or group.num_rows == 0:
                return None
            turn = group["turn_idx"].to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            keep = (turn * np.uint64(2654435761)) % np.uint64(n_shards) \
                == np.uint64(shard)
            return compact_bucket(group.filter(pa.array(keep)),
                                  shard=shard)
        return fold

    paths = state.run_paths(prev)
    # hot-bucket salting gate: measured (footer-stats) skew only; a
    # rebucket migration recomputes bucket routing, so stored-bucket
    # estimates would lie — skip salting there
    hot: set[int] = set()
    n_shards = max(2, cfg.salt_factor)
    if cfg.compact_salt_rows and not rebucket:
        est = _bucket_rows_estimate(paths, cfg.num_buckets)
        mean = max(1.0, float(est[est > 0].mean())) if est.any() else 1.0
        hot = {int(b) for b in np.flatnonzero(
            (est > cfg.compact_salt_rows) & (est > 2 * mean))}
    waves = max(1, min(int(waves), cfg.num_buckets))
    metas = []
    for w in range(waves):
        subset = None if waves == 1 else list(range(w, cfg.num_buckets, waves))
        per_bucket = _exchange_by_bucket(paths, cfg.num_buckets,
                                         bucket_subset=subset,
                                         rebucket=rebucket)
        bucket_ids = subset if subset is not None \
            else list(range(cfg.num_buckets))
        tasks = []
        for b, refs in zip(bucket_ids, per_bucket):
            if b in hot:
                tasks += [_fold_bucket_refs.remote(sub_fold(s, n_shards),
                                                   *refs)
                          for s in range(n_shards)]
            else:
                tasks.append(_fold_bucket_refs.remote(compact_bucket,
                                                      *refs))
        metas += [m for m in ray.get(tasks) if m]

    buckets: dict[str, list[str]] = {}
    for m in metas:          # hot buckets legitimately carry S files
        buckets.setdefault(str(m["bucket"]), []).append(m["file"])
    manifest = _publish_compaction_rebased(
        state, cfg, prev_version, prev, txn,
        my_buckets=buckets,
        my_derived=_compact_derived(state, prev, txn),
        keep_ops=keep_ops,
        my_schema=prev.schema_version,
        num_buckets=cfg.num_buckets,
        metrics={"compaction": True,
                 "live_rows": int(sum(m["rows"] for m in metas))},
        rebucket=rebucket,
    )
    return manifest


# --------------------------------------------------------------------------
# the continuous runner (Pipeline.asContinuous parity, W1-W3)
# --------------------------------------------------------------------------

def run_loop(cfg: EngineConfig, max_ticks: int | None = None,
             poll_interval_s: float = 0.2,
             compact_every: int = 0,
             stop_when_idle: bool = False,
             background_compaction: bool = False) -> list[TickResult]:
    """Driver micro-batch loop: poll WAL -> apply tick -> commit ->
    (periodic compaction). The analogue of `Pipeline.asContinuous`
    (`Pipeline.scala:6-20`) + `waitStreamAsData`
    (`SnowflakeUtils.scala:120-128`); in tests a bounded replay.

    `background_compaction=True` runs each triggered compaction in a
    driver-side thread CONCURRENTLY with subsequent ticks instead of
    stalling the loop for it -- the production shape at scale, where a
    full-table compaction takes orders of magnitude longer than a
    tick. Safe because commits rebase on commutable conflicts
    (`_publish_append_rebased` / `_publish_compaction_rebased`):
    whichever side loses the version race re-points its run files and
    retries; a compaction that loses non-commutably (retries
    exhausted) just yields -- the next trigger re-attempts from fresh
    state. At most ONE compaction is in flight (a live thread defers
    new triggers), and the in-thread GC runs only when
    `cfg.gc_min_age_s > 0` (the age guard is what protects a
    concurrent tick's written-but-unpublished runs from the sweep)."""
    import threading
    import time

    if background_compaction and cfg.gc_min_age_s <= 0:
        # the foreground path GCs after every compaction even at age 0
        # (single-writer mode), but the background thread REQUIRES the
        # age guard to avoid sweeping a concurrent tick's
        # written-but-unpublished runs -- so age 0 disables GC there.
        # A long-running deployment that flips the flag must not
        # silently accumulate superseded run files forever.
        import warnings
        warnings.warn(
            "run_loop(background_compaction=True) with gc_min_age_s=0 "
            "disables orphan-run GC entirely (the age guard is what "
            "makes a concurrent sweep safe); set cfg.gc_min_age_s to a "
            "value above your longest write-to-publish gap (e.g. 300) "
            "to re-enable it", RuntimeWarning, stacklevel=2)

    if cfg.matviews:
        # fail fast on a typo'd view name BEFORE any tick commits --
        # the per-tick refresh would otherwise KeyError mid-run with
        # WAL partially consumed
        from .matview import GROUPED_MATVIEWS, MATVIEWS
        bad = [v for v in cfg.matviews
               if v not in MATVIEWS and v not in GROUPED_MATVIEWS]
        if bad:
            raise KeyError(
                f"unknown matview(s) {bad}; registered: "
                f"{sorted({*MATVIEWS, *GROUPED_MATVIEWS})}")

    compactor: list = [None]
    bg_errors: list = []

    def _bg_compact():
        try:
            compact(cfg)
            if cfg.gc_min_age_s > 0:
                TableState(cfg.table_dir).gc_orphan_runs(
                    keep_versions=cfg.gc_keep_versions,
                    min_age_s=cfg.gc_min_age_s)
        except CommitConflict:
            pass          # non-commutable loss; next trigger re-attempts
        except Exception as e:  # noqa: BLE001 -- surfaced after the loop
            bg_errors.append(e)

    results: list[TickResult] = []
    ticks = 0
    while max_ticks is None or ticks < max_ticks:
        res = apply_tick(cfg)
        if res is None:
            if stop_when_idle:
                break
            time.sleep(poll_interval_s)
            continue
        results.append(res)
        ticks += 1
        if cfg.matviews:
            from .matview import refresh_matview
            for mv in cfg.matviews:
                # a refresh can lose the version race to a background
                # compaction; each retry is a fresh transaction built
                # on the new latest (refresh reloads state internally)
                for attempt in range(max(0, cfg.commit_retries) + 1):
                    try:
                        refresh_matview(cfg, mv)
                        break
                    except CommitConflict:
                        if attempt >= cfg.commit_retries:
                            raise
        backlog = (cfg.auto_compact_runs and
                   len(res.manifest.table_run_files()) > cfg.auto_compact_runs)
        if backlog or (compact_every and ticks % compact_every == 0):
            if background_compaction:
                t = compactor[0]
                if t is None or not t.is_alive():
                    t = threading.Thread(target=_bg_compact, daemon=True,
                                         name="bg-compaction")
                    compactor[0] = t
                    t.start()
            else:
                compact(cfg)
                # sweep run files no manifest in the retention window
                # references (aborted txns, superseded compactions) --
                # a long-running deployment must not accumulate them
                TableState(cfg.table_dir).gc_orphan_runs(
                    keep_versions=cfg.gc_keep_versions,
                    min_age_s=cfg.gc_min_age_s)
    if compactor[0] is not None:
        compactor[0].join()
    if bg_errors:
        raise bg_errors[0]
    return results


def bootstrap_import(cfg: EngineConfig, source, lsn: int = -1) -> Manifest:
    """Initial-load backfill: register an EXISTING table (parquet path
    or Dataset) as the lake table's first committed snapshot without
    synthesizing per-row WAL events -- the production path for "bulk
    load history, then tail CDC from here". SHOW_INITIAL_ROWS /
    overwrite-bootstrap parity (`SnowflakeUtils.scala:51,60`,
    `IngestAndOverwriteRestaurantWithStage.scala:43`).

    Every imported row becomes a collapsed full record at `lsn`
    (default -1: strictly before any WAL lsn, so replayed CDC events
    always win the LWW fold -- exactly the initial-snapshot-then-delta
    semantic). Source columns go through the schema-registry
    projection (case-insensitive, cast, null-fill), so an older or
    differently-cased source lays down cleanly under the current
    schema version. Streams batch-by-batch: each task writes one
    sorted global run (direct-mode layout), only metrics rows reach
    the driver, and nothing is visible until the single manifest
    publish. Requires an empty table (no committed runs)."""
    cfg.ensure_dirs()
    state = TableState(cfg.table_dir)
    prev_version, prev = state.load_latest_versioned()
    if prev.buckets or prev.global_runs:
        raise ValueError(
            "bootstrap_import requires an empty table; the backfill "
            "must be the first commit (import into a fresh table_dir, "
            "or compact+inspect before re-importing)")
    ds = ray.data.read_parquet(source) if isinstance(source, str) else source
    target = schemas.table_schema(cfg.schema_version)
    payload = schemas.payload_cols(cfg.schema_version)
    txn = state.new_txn()
    runs_dir = state.runs_dir
    nb = cfg.num_buckets
    cols = RUN_COLS_FIXED + payload

    def import_batch(batch: pa.Table) -> pd.DataFrame:
        t = normalize_batch(batch, target)
        n = t.num_rows
        if n == 0:
            return _empty_metrics()
        t = t.append_column(schemas.LSN_COL,
                            pa.array(np.full(n, lsn, np.int64)))
        t = t.append_column(schemas.OP_COL,
                            pa.array([schemas.OP_FULL] * n, pa.string()))
        t = add_partition_cols(t, nb)
        out = t.select(cols)
        okh = key_hash(out["conv_id"],
                       out["turn_idx"].to_numpy(zero_copy_only=False))
        out = out.take(pa.array(np.lexsort((
            okh, out[BUCKET_COL].to_numpy(zero_copy_only=False)))))
        fname = f"delta-x{txn}-{uuid.uuid4().hex[:12]}.parquet"
        path = os.path.join(runs_dir, fname)
        tmp = path + ".tmp"
        pq.write_table(out, tmp, compression="zstd")
        os.replace(tmp, path)
        m = _empty_metrics()
        m.loc[0] = {"bucket": -1, "shard": -1, "file": fname,
                    "events_in": n, "records_out": n, "n_full": n,
                    "n_partial": 0, "n_delete": 0, "max_lsn": lsn,
                    "derived_file": None}
        return m

    metrics = ds.map_batches(import_batch, batch_format="pyarrow",
                             zero_copy_batch=True,
                             batch_size=cfg.direct_batch_rows).to_pandas()
    if "file" not in metrics.columns:
        # a ZERO-BLOCK source yields a columnless empty frame; an
        # empty bootstrap is still a legitimate first commit (table
        # exists, tail CDC from here)
        metrics = _empty_metrics()
    return state.publish(expected_parent=prev_version, manifest=Manifest(
        txn_id=txn, committed_seq=prev.committed_seq, committed_lsn=lsn,
        schema_version=cfg.schema_version, num_buckets=nb,
        buckets={}, global_runs=sorted(metrics["file"].dropna()),
        derived={}, wal_consumed=[],
        metrics={"bootstrap_import": True,
                 "events_applied": int(metrics["events_in"].sum()),
                 "records_written": int(metrics["records_out"].sum()),
                 "lag": 0}))


def metrics_history(cfg: EngineConfig) -> pd.DataFrame:
    """Per-version metrics time series from the manifest lineage (the
    north-star's throughput/lag observable surface, U3 MergeResult
    parity as a queryable table instead of printouts): one row per
    committed version, oldest first -- events applied, records written,
    replication lag (max WAL lsn - committed lsn at commit time),
    segments consumed, run-file count, and whether the version was a
    compaction. Driver-side by construction: manifests are O(versions)
    small JSON, never data files."""
    state = TableState(cfg.table_dir)
    rows = []
    for m in reversed(state.lineage()):
        met = m.metrics or {}
        rows.append({
            "version": m.version,
            "txn_id": m.txn_id,
            "committed_seq": m.committed_seq,
            "committed_lsn": m.committed_lsn,
            "schema_version": m.schema_version,
            "is_compaction": bool(met.get("compaction")),
            "events_applied": int(met.get("events_applied", 0)),
            "records_written": int(met.get("records_written", 0)),
            "lag": int(met.get("lag", 0)),
            "segments_consumed": len(m.wal_consumed),
            "table_run_files": len(m.table_run_files()),
        })
    return pd.DataFrame(rows)
