"""Physical erasure (`ingest.erase_conversation`): one conversation's
bytes leave the table's run files (and optionally the WAL) in a
bucket-proportional rewrite committed as one strict-CAS manifest."""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from techtalk_data_pipeline_snowpark_ray.config import EngineConfig
from techtalk_data_pipeline_snowpark_ray.pipelines import ingest
from techtalk_data_pipeline_snowpark_ray.pipelines.matview import (
    read_matview, refresh_matview)
from techtalk_data_pipeline_snowpark_ray.sources.generate import (
    GenSpec, write_wal)
from techtalk_data_pipeline_snowpark_ray.state.manifest import TableState

SPEC = GenSpec(n_events=3000, n_conversations=40, max_turns=10,
               zipf_s=1.2, ooo_window=16, dup_fraction=0.03,
               partial_update_fraction=0.2, schema_add_at=1000,
               schema_widen_at=2000, seed=3)


def _mk(tmp_path, **kw):
    cfg = EngineConfig(table_dir=str(tmp_path / "t"),
                       wal_dir=str(tmp_path / "w"),
                       num_buckets=4, apply_mode="direct", **kw)
    cfg.ensure_dirs()
    return cfg


def _build(cfg, spec=SPEC):
    write_wal(spec, cfg.wal_dir, segment_rows=400)
    assert ingest.apply_tick(cfg) is not None
    snap = ingest.snapshot_to_pandas(cfg)
    # a conversation that actually has live rows
    return snap["conv_id"].value_counts().idxmax()


def _files_containing(runs_dir, conv_id):
    out = []
    for p in glob.glob(os.path.join(runs_dir, "*.parquet")):
        t = pq.read_table(p, columns=["conv_id"]) \
            if "conv_id" in pq.read_schema(p).names else None
        if t is not None and (t["conv_id"].to_pandas() == conv_id).any():
            out.append(p)
    return out


def test_erase_removes_key_physically_and_keeps_rest(tmp_path):
    cfg = _mk(tmp_path)
    victim = _build(cfg)
    # compact so the table has per-bucket bases: the erasure rewrite
    # set must then be the victim's bucket only
    ingest.compact(cfg)
    before = ingest.snapshot_to_pandas(cfg)
    state = TableState(cfg.table_dir)
    m = ingest.erase_conversation(cfg, victim)
    stats = m.metrics["erasure"]
    assert stats["rows_erased"] > 0 and stats["files_rewritten"] > 0
    after = ingest.snapshot_to_pandas(cfg)
    assert victim not in set(after["conv_id"])
    pd.testing.assert_frame_equal(
        after.reset_index(drop=True),
        before[before["conv_id"] != victim].reset_index(drop=True))
    # PHYSICAL: no file the new manifest references contains the key
    latest = state.load_latest()
    for f in latest.run_files():
        p = os.path.join(state.runs_dir, f)
        if "conv_id" not in pq.read_schema(p).names:
            continue
        col = pq.read_table(p, columns=["conv_id"])["conv_id"].to_pandas()
        assert not (col == victim).any(), f
    # GC ages out the old bytes: after the retention window collapses
    # to the erasure commit, nothing on disk holds the key
    state.gc_orphan_runs(keep_versions=1)
    assert _files_containing(state.runs_dir, victim) == []
    # stream offsets untouched: the table is still exactly-once idle
    assert ingest.apply_tick(cfg) is None
    # untouched files stayed byte-identical (not rewritten): at least
    # one other bucket's runs kept their names
    prev = state.load(m.version - 1)
    shared = set(prev.table_run_files()) & set(latest.table_run_files())
    assert shared


def test_erase_then_compact_and_requery(tmp_path):
    cfg = _mk(tmp_path)
    victim = _build(cfg)
    ingest.erase_conversation(cfg, victim)
    n = len(ingest.snapshot_to_pandas(cfg))
    ingest.compact(cfg)
    after = ingest.snapshot_to_pandas(cfg)
    assert len(after) == n and victim not in set(after["conv_id"])


def test_erase_scrubs_wal_and_replay_stays_clean(tmp_path):
    cfg = _mk(tmp_path)
    victim = _build(cfg)
    ingest.erase_conversation(cfg, victim, scrub_wal=True)
    # the log itself no longer holds the key
    for p in glob.glob(os.path.join(cfg.wal_dir, "*.parquet")):
        col = pq.read_table(p, columns=["conv_id"])["conv_id"].to_pandas()
        assert not (col == victim).any(), p
    # a from-scratch replay of the scrubbed WAL (fresh table) matches
    # the erased state: erasure + scrub == the key never existed
    cfg2 = EngineConfig(table_dir=str(tmp_path / "t2"),
                        wal_dir=cfg.wal_dir, num_buckets=4,
                        apply_mode="direct")
    cfg2.ensure_dirs()
    assert ingest.apply_tick(cfg2) is not None
    pd.testing.assert_frame_equal(ingest.snapshot_to_pandas(cfg2),
                                  ingest.snapshot_to_pandas(cfg))
    # and a rollback across the erasure must REFUSE: restoring a
    # pre-erasure version would resurrect the erased bytes from
    # still-retained files
    with pytest.raises(ValueError, match="across the erasure"):
        ingest.rollback(cfg, 0, rewind_stream=True)
    assert victim not in set(ingest.snapshot_to_pandas(cfg)["conv_id"])


def test_erase_purges_keyed_matview_and_forces_recompute(tmp_path):
    cfg = _mk(tmp_path)
    victim = _build(cfg)
    refresh_matview(cfg, "conv_live_stats")
    assert victim in set(
        read_matview(cfg, "conv_live_stats").to_pandas()["conv_id"])
    ingest.erase_conversation(cfg, victim)
    # the view's REPLACED files no longer hold the key even before the
    # next refresh...
    state = TableState(cfg.table_dir)
    for f in state.load_latest().derived.get("mv:conv_live_stats", []):
        col = pq.read_table(os.path.join(state.runs_dir, f),
                            columns=["conv_id"])["conv_id"].to_pandas()
        assert not (col == victim).any()
    # ...and the next refresh is a forced full recompute
    m = refresh_matview(cfg, "conv_live_stats")
    stats = m.metrics["matview_refresh"]
    assert stats["mode"] == "full" and stats["reason"] == "erasure"
    mv = read_matview(cfg, "conv_live_stats").to_pandas()
    assert victim not in set(mv["conv_id"])


def test_erase_scrubs_unconsumed_tail_against_resurrection(tmp_path):
    """Default (scrub_wal=False) erasure must still prevent the VERY
    NEXT tick from re-inserting the key out of not-yet-consumed WAL
    segments: the unconsumed tail is always scrubbed."""
    from techtalk_data_pipeline_snowpark_ray.sources.generate import \
        generate_chunks
    from techtalk_data_pipeline_snowpark_ray.sources.wal import WalWriter

    cfg = _mk(tmp_path)
    chunks = list(generate_chunks(SPEC))
    mid = len(chunks) // 2 or 1
    w = WalWriter(cfg.wal_dir, segment_rows=400, reorder_slack=64)
    for t, v in chunks[:mid]:
        w.append(t, v)
    w.flush()
    assert ingest.apply_tick(cfg) is not None
    snap1 = ingest.snapshot_to_pandas(cfg)
    # a conv with phase-1 rows AND events in the unconsumed phase 2
    tail_convs = set()
    for t, v in chunks[mid:]:
        tail_convs.update(t["conv_id"].to_pylist())
    victim = next(c for c in snap1["conv_id"].value_counts().index
                  if c in tail_convs)
    for t, v in chunks[mid:]:
        w.append(t, v)
    w.close()
    ingest.erase_conversation(cfg, victim)          # scrub_wal=False
    assert ingest.apply_tick(cfg) is not None       # consume the tail
    after = ingest.snapshot_to_pandas(cfg)
    assert victim not in set(after["conv_id"])      # no resurrection
    # the rest of phase 2 DID apply
    assert len(after) > len(snap1[snap1["conv_id"] != victim])


def test_erase_invalidates_content_bearing_views(tmp_path):
    """Derived files without a conv_id column (the token index) embed
    the erased TEXT itself; erasure must drop them from the manifest
    so no referenced file carries the content, and the next refresh
    rebuilds clean."""
    from techtalk_data_pipeline_snowpark_ray.pipelines.matview import (
        read_grouped_matview, refresh_matview)

    cfg = _mk(tmp_path)
    victim = _build(cfg)
    refresh_matview(cfg, "token_index")
    m = ingest.erase_conversation(cfg, victim)
    assert "gmv:token_index" in m.metrics["erasure"]["views_invalidated"]
    state = TableState(cfg.table_dir)
    assert "gmv:token_index" not in state.load_latest().derived
    assert read_grouped_matview(cfg, "token_index").count() == 0
    # rebuild: full (first-refresh over the erased table), clean
    m2 = refresh_matview(cfg, "token_index")
    assert m2.metrics["matview_refresh"]["mode"] == "full"
    idx = read_grouped_matview(cfg, "token_index").to_pandas()
    assert len(idx) > 0
    # parity against the erased snapshot's brute tokenization
    import re
    from collections import Counter
    snap = ingest.snapshot_to_pandas(cfg)
    hits = Counter()
    for txt in snap["text"].dropna():
        for tok in re.split("[^a-z0-9]+", txt.lower()):
            if tok:
                hits[tok] += 1
    assert len(idx) == len(hits)


def test_tick_refuses_rebase_onto_concurrent_erasure(tmp_path):
    """An ingest tick losing the version race to an erasure must NOT
    re-point its delta files (they may hold the key's pre-scrub rows);
    it raises CommitConflict instead."""
    from unittest import mock

    from techtalk_data_pipeline_snowpark_ray.sources.generate import \
        generate_chunks
    from techtalk_data_pipeline_snowpark_ray.sources.wal import WalWriter
    from techtalk_data_pipeline_snowpark_ray.state.manifest import \
        CommitConflict

    cfg = _mk(tmp_path)
    chunks = list(generate_chunks(SPEC))
    mid = len(chunks) // 2 or 1
    w = WalWriter(cfg.wal_dir, segment_rows=400, reorder_slack=64)
    for t, v in chunks[:mid]:
        w.append(t, v)
    w.flush()
    assert ingest.apply_tick(cfg) is not None
    victim = ingest.snapshot_to_pandas(cfg)["conv_id"] \
        .value_counts().idxmax()
    for t, v in chunks[mid:]:
        w.append(t, v)
    w.close()
    # the erasure wins the race DURING the phase-2 tick's publish; the
    # tick's committed_seq check alone would let it rebase (erasure
    # leaves the offset untouched) — the erasure guard must refuse
    orig = TableState.publish
    fired = {"n": 0}

    def race(self, manifest, expected_parent=None, **kw):
        if not fired["n"] and not manifest.metrics.get("erasure"):
            fired["n"] = 1
            ingest.erase_conversation(cfg, victim)
        return orig(self, manifest, expected_parent=expected_parent)

    with mock.patch.object(TableState, "publish", race):
        with pytest.raises(CommitConflict, match="erasure"):
            ingest.apply_tick(cfg)
    assert fired["n"] == 1
    # the erasure's effect rules the final state (the tick aborted)
    assert victim not in set(ingest.snapshot_to_pandas(cfg)["conv_id"])
    # the aborted tick left the offset unconsumed: a RE-RUN tick
    # applies phase 2, still without the victim (tail was scrubbed)
    assert ingest.apply_tick(cfg) is not None
    assert victim not in set(ingest.snapshot_to_pandas(cfg)["conv_id"])


def test_read_delta_refuses_window_spanning_erasure(tmp_path):
    cfg = _mk(tmp_path)
    victim = _build(cfg)
    v0 = TableState(cfg.table_dir).latest_version()
    ingest.erase_conversation(cfg, victim)
    with pytest.raises(ValueError, match="erasure"):
        ingest.read_delta(cfg, v0 - 1 if v0 else 0)


def test_erase_batch_rewrites_each_file_once(tmp_path):
    """A multi-key batch erases all keys in ONE commit, rewriting each
    affected file once for the whole set."""
    cfg = _mk(tmp_path)
    _build(cfg)
    ingest.compact(cfg)
    snap = ingest.snapshot_to_pandas(cfg)
    victims = list(snap["conv_id"].value_counts().index[:3])
    before = ingest.snapshot_to_pandas(cfg)
    state = TableState(cfg.table_dir)
    v0 = state.latest_version()
    m = ingest.erase_conversations(cfg, victims)
    assert state.latest_version() == v0 + 1          # one commit
    assert m.metrics["erasure"]["conv_ids"] == sorted(victims)
    after = ingest.snapshot_to_pandas(cfg)
    assert set(after["conv_id"]) & set(victims) == set()
    pd.testing.assert_frame_equal(
        after.reset_index(drop=True),
        before[~before["conv_id"].isin(victims)].reset_index(drop=True))
    # each affected file rewritten once for the whole batch: rewritten
    # count is bounded by the affected-bucket file count, not by keys
    latest = state.load_latest()
    assert m.metrics["erasure"]["files_rewritten"] <= \
        len(latest.table_run_files())
    for f in latest.table_run_files():
        p = os.path.join(state.runs_dir, f)
        col = pq.read_table(p, columns=["conv_id"])["conv_id"].to_pandas()
        assert not col.isin(victims).any(), f
    with pytest.raises(ValueError, match="empty erasure batch"):
        ingest.erase_conversations(cfg, [])


def test_erase_keeps_additive_sinks_and_rewrites_keyed_ones(tmp_path):
    """Additive derived sinks have NO recompute path: erasure must
    rewrite the conv_id-keyed ones and RETAIN (never drop) the
    non-keyed numeric aggregates like role_stats."""
    from techtalk_data_pipeline_snowpark_ray.pipelines.ingest import \
        read_derived

    cfg = _mk(tmp_path, derived_views=("conv_stats", "role_stats"))
    victim = _build(cfg)
    roles_before = read_derived(cfg, "role_stats").to_pandas()
    assert len(roles_before) > 0
    m = ingest.erase_conversation(cfg, victim)
    stats = m.metrics["erasure"]
    assert stats["views_retained_aggregate"] == ["role_stats"]
    assert "role_stats" not in stats["views_invalidated"]
    # the retained aggregate survives byte-identically
    roles_after = read_derived(cfg, "role_stats").to_pandas()
    pd.testing.assert_frame_equal(
        roles_after.sort_values("role", ignore_index=True),
        roles_before.sort_values("role", ignore_index=True))
    # the keyed sink was rewritten: the victim's row is gone
    convs = read_derived(cfg, "conv_stats").to_pandas()
    assert victim not in set(convs["conv_id"])


def test_erase_crash_before_publish_leaves_old_state(tmp_path):
    """Crash-equivalence: an erasure that dies after writing its
    rewritten files but BEFORE the manifest publish leaves the old
    state ruling; the half-written -er files are unreferenced orphans
    that GC sweeps; a retry completes cleanly."""
    from unittest import mock

    cfg = _mk(tmp_path)
    victim = _build(cfg)
    before = ingest.snapshot_to_pandas(cfg)
    state = TableState(cfg.table_dir)
    v0 = state.latest_version()

    boom = RuntimeError("crash before publish")
    with mock.patch.object(TableState, "publish", side_effect=boom):
        with pytest.raises(RuntimeError, match="crash before publish"):
            ingest.erase_conversation(cfg, victim)
    assert state.latest_version() == v0              # nothing committed
    pd.testing.assert_frame_equal(ingest.snapshot_to_pandas(cfg), before)
    orphans = [f for f in os.listdir(state.runs_dir) if "-er" in f]
    assert orphans                                   # half-written files
    swept = state.gc_orphan_runs(keep_versions=1)
    assert set(orphans) <= set(swept)
    # retry completes and erases for real
    m = ingest.erase_conversation(cfg, victim)
    assert m.metrics["erasure"]["rows_erased"] > 0
    assert victim not in set(ingest.snapshot_to_pandas(cfg)["conv_id"])


def test_clone_retry_after_partial_link_failure(tmp_path):
    """A clone that dies mid-link leaves no commit at the destination;
    a retry re-walks the file list (link_or_copy is idempotent) and
    publishes v0 cleanly."""
    from unittest import mock

    from techtalk_data_pipeline_snowpark_ray.state.storage import \
        LocalStorage

    cfg = EngineConfig(table_dir=str(tmp_path / "src"),
                       wal_dir=str(tmp_path / "w-src"),
                       num_buckets=4, apply_mode="direct")
    cfg.ensure_dirs()
    _build(cfg)
    ingest.compact(cfg)                   # several per-bucket files
    dst = EngineConfig(table_dir=str(tmp_path / "dst"),
                       wal_dir=cfg.wal_dir, num_buckets=4,
                       apply_mode="direct")
    orig = LocalStorage.link_or_copy
    calls = {"n": 0}

    def flaky(self, a, b):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("disk hiccup mid-clone")
        return orig(self, a, b)

    with mock.patch.object(LocalStorage, "link_or_copy", flaky):
        with pytest.raises(OSError, match="mid-clone"):
            ingest.clone_table(cfg, dst)
    assert TableState(dst.table_dir).latest_version() is None
    m = ingest.clone_table(cfg, dst)      # retry: idempotent re-walk
    assert m.version == 0
    pd.testing.assert_frame_equal(ingest.snapshot_to_pandas(dst),
                                  ingest.snapshot_to_pandas(cfg))


def test_erase_unknown_key_is_a_clean_noop_commit(tmp_path):
    cfg = _mk(tmp_path)
    _build(cfg)
    before = ingest.snapshot_to_pandas(cfg)
    m = ingest.erase_conversation(cfg, "conv-does-not-exist")
    assert m.metrics["erasure"]["rows_erased"] == 0
    assert m.metrics["erasure"]["files_rewritten"] == 0
    pd.testing.assert_frame_equal(ingest.snapshot_to_pandas(cfg), before)


def test_erase_retries_internally_after_losing_version_race(tmp_path):
    """erase_conversations scrubs the unconsumed WAL tail BEFORE its
    strict-CAS publish, so losing the version race must retry
    INTERNALLY (reload, re-rewrite, re-publish) -- an abandoned attempt
    would leave the conversation in the table with its in-flight WAL
    updates already destroyed and no erasure recorded."""
    from unittest import mock

    from techtalk_data_pipeline_snowpark_ray.sources.generate import \
        generate_chunks
    from techtalk_data_pipeline_snowpark_ray.sources.wal import WalWriter

    cfg = _mk(tmp_path)
    chunks = list(generate_chunks(SPEC))
    mid = len(chunks) // 2 or 1
    w = WalWriter(cfg.wal_dir, segment_rows=400, reorder_slack=64)
    for t, v in chunks[:mid]:
        w.append(t, v)
    w.flush()
    assert ingest.apply_tick(cfg) is not None
    victim = ingest.snapshot_to_pandas(cfg)["conv_id"] \
        .value_counts().idxmax()
    for t, v in chunks[mid:]:
        w.append(t, v)
    w.close()

    orig = TableState.publish
    fired = {"n": 0}

    def race(self, manifest, expected_parent=None, **kw):
        # the first ERASURE publish loses to a concurrent tick (which
        # consumes the already-scrubbed phase-2 tail)
        if manifest.metrics.get("erasure") and not fired["n"]:
            fired["n"] = 1
            assert ingest.apply_tick(cfg) is not None
        return orig(self, manifest, expected_parent=expected_parent)

    with mock.patch.object(TableState, "publish", race):
        m = ingest.erase_conversations(cfg, [victim])
    assert fired["n"] == 1                    # the race actually fired
    assert m.metrics["erasure"]["conv_ids"] == [victim]
    # the retry re-ran the rewrite against the tick's state: the victim
    # is gone AND the tick's phase-2 rows for other keys are present
    snap = ingest.snapshot_to_pandas(cfg)
    assert victim not in set(snap["conv_id"])
    assert ingest.apply_tick(cfg) is None     # nothing left unconsumed
