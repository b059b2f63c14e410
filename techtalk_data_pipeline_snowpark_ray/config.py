"""Engine configuration.

Reference parity: the reference indirects every object name through a
YAML config (``ConfigUtils.scala:24-84``, ``conf.yml:8-42``). We keep a
single dataclass (optionally loadable from YAML-ish dict) holding
directories, partitioning parameters and tuning knobs.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field, asdict


@dataclass
class EngineConfig:
    # --- layout -----------------------------------------------------------
    #: root directory of the lake table (runs/ + _manifest/ live under it)
    table_dir: str = "/tmp/ttdps/table"
    #: directory of WAL/binlog segments (append-only parquet files)
    wal_dir: str = "/tmp/ttdps/wal"

    # --- partitioning -----------------------------------------------------
    #: number of hash buckets over conv_id. The unit of key-exclusive apply
    #: and of compaction. On a real cluster size this to ~2-4x total cores so
    #: stragglers rebalance; a bucket's live rows must fit one worker's heap.
    num_buckets: int = 32
    #: sub-splits for hot conversations (salting). A hot conv's events are
    #: spread over `salt_factor` shards by hash(turn_idx); key-exclusive
    #: because the full PK (conv_id, turn_idx) determines the shard.
    salt_factor: int = 4
    #: events-per-conversation threshold (within one tick) above which a
    #: conversation is salted. 0 disables auto-detection.
    hot_key_threshold: int = 0

    # --- execution --------------------------------------------------------
    #: rows per batch for map_batches stages (tune by bytes: transcript text
    #: dominates; ~64k rows * ~200B text ~ 13MB/batch).
    batch_size: int = 65536
    #: rows per fold/write unit in direct apply mode. Ray's parquet read
    #: can emit many small blocks (one per row group); coalescing them to
    #: ~256k rows (~65MB of transcript) per applier call cuts run-file
    #: count ~20x, improves the within-task fold ratio, and measured
    #: 3.8x faster compaction at 96M events -- while one batch x workers
    #: still fits comfortably in worker heaps. Size DOWN for fat rows.
    direct_batch_rows: int = 262144
    #: actor-pool size for the merge-apply stage; None -> let Ray size tasks.
    apply_concurrency: int | None = None
    #: pre-collapse each batch before the shuffle (combiner). Cuts shuffle
    #: bytes when a tick contains many updates to the same keys.
    pre_collapse: bool = True
    #: target schema version to normalize to (see schemas.REGISTRY).
    schema_version: int = 3
    #: apply strategy:
    #:  "shuffle" -- groupby(shard).map_groups merge-apply: one run per
    #:    bucket per tick (key-partitioned layout immediately; pays an
    #:    all-to-all per tick).
    #:  "direct"  -- LSM-style shuffle-free apply: each task collapses
    #:    its lsn-interval batch and writes a sorted delta run directly;
    #:    the (collapsed, much smaller) shuffle is deferred to
    #:    compaction/snapshot-read. Scales linearly with cores; the
    #:    right mode for sustained high-throughput ingest.
    apply_mode: str = "shuffle"
    #: also maintain the derived `conv_stats` sink (per-conversation
    #: consumed-record counters), fed by the same delta and committed in
    #: the same atomic manifest publish as the main table (the
    #: reference's one-stream-two-sinks transaction, stream/Main.scala).
    #: Shorthand for including "conv_stats" in derived_views.
    derived_conv_stats: bool = False
    #: NAMED derived views maintained alongside the table (see
    #: pipelines/derived.py registry) -- all fed by the same consumed
    #: delta, all committed in the same manifest publish.
    derived_views: tuple = ()
    #: MATERIALIZED aggregate views over the RESOLVED table state
    #: (pipelines/matview.py registry), refreshed delta-proportionally
    #: by run_loop after every tick (retraction-aware; each refresh is
    #: its own manifest commit pinned to the tick's version).
    matviews: tuple = ()

    #: bad-record policy for WAL change records (stages/validate.py):
    #: "none" trusts the producer (zero hot-path cost; the engine's own
    #: WalWriter is schema-checked), "fail" raises loudly on the first
    #: malformed record (tick rolls back, WAL unconsumed), "quarantine"
    #: diverts malformed rows to <table_dir>/_quarantine and proceeds.
    bad_record_policy: str = "none"

    #: compact automatically when the committed table's run-file count
    #: exceeds this (0 disables). The production trigger: backlog-based,
    #: so compaction cost tracks ingest volume instead of tick count
    #: (run_loop's `compact_every` remains the simpler cadence knob).
    auto_compact_runs: int = 0

    #: optimistic-concurrency retry budget: when a commit loses the
    #: version race (state/manifest.py CommitConflict) and the winning
    #: transactions COMMUTE with this one (ingest append vs compaction,
    #: append vs append on disjoint inputs -- see ingest._rebase_*),
    #: the loser's manifest is rebased onto the new latest and
    #: re-published up to this many times, reusing its already-written
    #: run files instead of recomputing the transaction. Non-commutable
    #: conflicts (two ingests consuming the same WAL window, competing
    #: compactions, layout migrations) always raise regardless.
    #: 0 restores raise-on-first-conflict.
    commit_retries: int = 3

    #: minimum age (seconds, by mtime) before the GC may delete an
    #: unreferenced run file. Protects a concurrent committer's
    #: written-but-not-yet-published runs from being swept; size it
    #: above the longest write-to-publish gap. 0 = single-writer mode.
    gc_min_age_s: float = 0.0

    #: manifest versions whose run files the post-compaction GC keeps
    #: (time-travel / in-flight-reader retention window). Orphans from
    #: aborted txns and superseded compactions older than this are
    #: deleted by run_loop after each compaction.
    gc_keep_versions: int = 2

    #: compaction hot-bucket salting gate: a bucket whose input rows
    #: (exact parallel count of the bucket column) exceed BOTH this
    #: floor and 2x the mean folds in `max(2, salt_factor)` parallel
    #: key-exclusive sub-shards (hash(turn_idx) % S — the same salt as
    #: the apply stage) instead of one straggler task; each sub-shard
    #: writes its own base file (manifests already carry per-bucket
    #: file LISTS, so every reader is unaffected). Measured: a 2.4M-row
    #: hot bucket (one long conversation) compacted 18.4 s -> see
    #: BENCH A/B. 0 disables.
    compact_salt_rows: int = 1_500_000

    # --- generator / determinism -----------------------------------------
    seed: int = 42

    # --- misc -------------------------------------------------------------
    extras: dict = field(default_factory=dict)

    @property
    def runs_dir(self) -> str:
        return os.path.join(self.table_dir, "runs")

    @property
    def manifest_dir(self) -> str:
        return os.path.join(self.table_dir, "_manifest")

    @property
    def tmp_dir(self) -> str:
        # staging area for uncommitted writes (the `_tmp/<txn>` of the
        # commit protocol; analogue of autocommit-off DML before COMMIT).
        return os.path.join(self.table_dir, "_tmp")

    @property
    def num_shards(self) -> int:
        return self.num_buckets * self.salt_factor

    def ensure_dirs(self) -> None:
        for d in (self.table_dir, self.wal_dir, self.runs_dir,
                  self.manifest_dir, self.tmp_dir):
            os.makedirs(d, exist_ok=True)

    def to_json(self) -> str:
        return json.dumps(asdict(self), default=str)

    @classmethod
    def from_dict(cls, d: dict) -> "EngineConfig":
        known = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in d.items() if k in known})

    @classmethod
    def from_yaml(cls, path: str) -> "EngineConfig":
        """Load a config file — the reference's core ergonomic of
        indirecting every table/stage name and knob through one
        editable YAML (``ConfigUtils.scala:24-84``, ``conf.yml:8-42``).

        Accepts kebab-case or snake_case keys (the reference uses
        kebab-case), coerces YAML lists to the tuples the dataclass
        declares, and — unlike `from_dict`'s permissive merge — fails
        loudly on unknown keys, so a typo'd knob can't silently run
        with the default. Ships with `conf.example.yml` at the repo
        root."""
        import yaml
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        if not isinstance(raw, dict):
            raise ValueError(f"{path}: top level must be a mapping, "
                             f"got {type(raw).__name__}")
        d = {str(k).replace("-", "_"): v for k, v in raw.items()}
        known = set(cls.__dataclass_fields__)
        unknown = sorted(set(d) - known)
        if unknown:
            raise ValueError(
                f"{path}: unknown config key(s) {unknown}; "
                f"known: {sorted(known)}")
        for k in ("derived_views", "matviews"):
            v = d.get(k)
            if isinstance(v, str):       # scalar for a one-view list
                d[k] = (v,)
            elif isinstance(v, list):
                d[k] = tuple(v)
            elif k in d and v is None:
                # explicit empty YAML value ("derived_views:") means
                # no views — leaving None would crash run_loop later
                # with a bare TypeError instead of loading cleanly
                d[k] = ()
            elif v is not None and not isinstance(v, tuple):
                raise ValueError(
                    f"{path}: {k} must be a list of view names, "
                    f"got {type(v).__name__}")
        return cls(**d)
