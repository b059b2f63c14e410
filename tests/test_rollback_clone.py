"""Administrative state ops: `ingest.rollback` (restore / rewind) and
`ingest.clone_table` (zero-copy fork). Both are pure metadata commits
over immutable run files; every outcome is checked against the WAL
dict oracle, and the interplay with GC, matview refresh and the
changefeed (`read_delta`) is pinned."""

import os

import pandas as pd
import pytest

from techtalk_data_pipeline_snowpark_ray.config import EngineConfig
from techtalk_data_pipeline_snowpark_ray.pipelines import ingest
from techtalk_data_pipeline_snowpark_ray.sources.generate import (
    GenSpec, generate_chunks, write_wal)
from techtalk_data_pipeline_snowpark_ray.sources.wal import WalWriter
from techtalk_data_pipeline_snowpark_ray.state.manifest import (
    CommitConflict, TableState)

from test_engine_e2e import TINY, assert_matches_oracle, wal_oracle


def _mk_cfg(tmp_path, name="t", **kw):
    cfg = EngineConfig(table_dir=str(tmp_path / name),
                       wal_dir=str(tmp_path / f"w-{name}"),
                       num_buckets=4, apply_mode="direct", **kw)
    cfg.ensure_dirs()
    return cfg


def _two_ticks(cfg, spec=TINY):
    """Ingest the spec as two committed ticks; returns (v1, oracle1):
    the version and expected resolved state after phase 1 only."""
    chunks = list(generate_chunks(spec))
    mid = len(chunks) // 2 or 1
    w = WalWriter(cfg.wal_dir, segment_rows=300, reorder_slack=64)
    for t, v in chunks[:mid]:
        w.append(t, v)
    w.flush()
    assert ingest.apply_tick(cfg) is not None
    v1 = TableState(cfg.table_dir).latest_version()
    oracle1 = wal_oracle(cfg.wal_dir)
    for t, v in chunks[mid:]:
        w.append(t, v)
    w.close()
    assert ingest.apply_tick(cfg) is not None
    return v1, oracle1


def _snap(cfg) -> pd.DataFrame:
    return ingest.snapshot_to_pandas(cfg)


def test_rollback_restore_drops_later_ticks(tmp_path):
    cfg = _mk_cfg(tmp_path)
    v1, oracle1 = _two_ticks(cfg)
    state = TableState(cfg.table_dir)
    v2 = state.latest_version()
    m = ingest.rollback(cfg, v1)
    assert m.version == v2 + 1 and m.metrics["rollback_mode"] == "restore"
    snap = _snap(cfg)
    assert len(snap) == len(oracle1)
    pd.testing.assert_frame_equal(
        snap, oracle1.astype({c: snap[c].dtype for c in snap.columns}),
        check_dtype=False)
    # RESTORE keeps the stream offset: phase 2 is NOT re-consumed
    assert state.load_latest().committed_seq == \
        state.load(v2).committed_seq
    assert ingest.apply_tick(cfg) is None
    # time travel still sees the pre-rollback tip (lineage intact)
    tip = ingest.read_snapshot_as_of(cfg, v2).to_pandas()
    assert len(tip) == len(wal_oracle(cfg.wal_dir))


def test_rollback_rewind_replays_to_identical_state(tmp_path):
    cfg = _mk_cfg(tmp_path)
    v1, oracle1 = _two_ticks(cfg)
    before = _snap(cfg)
    ingest.rollback(cfg, v1, rewind_stream=True)
    mid = _snap(cfg)
    assert len(mid) == len(oracle1)          # content is back at v1
    # REWIND rewound the offset: the next tick re-consumes phase 2 and
    # the idempotent LWW fold converges to the original state
    assert ingest.apply_tick(cfg) is not None
    assert_matches_oracle(cfg)
    pd.testing.assert_frame_equal(_snap(cfg), before)
    assert ingest.apply_tick(cfg) is None    # and is exactly-once again


def test_rollback_survives_compaction_between(tmp_path):
    """Restore across a compaction: the target version's files were
    superseded but are still inside the GC retention window."""
    cfg = _mk_cfg(tmp_path)
    v1, oracle1 = _two_ticks(cfg)
    ingest.compact(cfg)
    ingest.rollback(cfg, v1)
    snap = _snap(cfg)
    assert len(snap) == len(oracle1)
    pd.testing.assert_frame_equal(
        snap, oracle1.astype({c: snap[c].dtype for c in snap.columns}),
        check_dtype=False)
    # and the restored (pre-compaction layout) table compacts cleanly
    ingest.compact(cfg)
    assert len(_snap(cfg)) == len(oracle1)


def test_rollback_rejects_gced_version(tmp_path):
    cfg = _mk_cfg(tmp_path)
    v1, _ = _two_ticks(cfg)
    ingest.compact(cfg)
    ingest.compact(cfg)
    # sweep everything not referenced by the last manifest only
    TableState(cfg.table_dir).gc_orphan_runs(keep_versions=1)
    with pytest.raises(ValueError, match="retention window"):
        ingest.rollback(cfg, v1)


def test_rollback_bad_targets_and_conflict(tmp_path):
    cfg = _mk_cfg(tmp_path)
    with pytest.raises(ValueError, match="no commits"):
        ingest.rollback(cfg, 0)
    v1, _ = _two_ticks(cfg)
    state = TableState(cfg.table_dir)
    with pytest.raises(ValueError, match="out of range"):
        ingest.rollback(cfg, state.latest_version() + 1)
    # strict CAS: losing a race raises, never auto-merges
    from unittest import mock
    orig = TableState.publish

    def race(self, manifest, expected_parent=None, **kw):
        if manifest.metrics.get("rollback_to") is not None:
            ingest.compact(cfg)          # concurrent winner
        return orig(self, manifest, expected_parent=expected_parent)

    with mock.patch.object(TableState, "publish", race):
        with pytest.raises(CommitConflict):
            ingest.rollback(cfg, v1)


def test_read_delta_refuses_window_spanning_rollback(tmp_path):
    cfg = _mk_cfg(tmp_path)
    v1, _ = _two_ticks(cfg)
    ingest.rollback(cfg, v1)
    with pytest.raises(ValueError, match="rollback"):
        ingest.read_delta(cfg, v1)
    # windows strictly before the rollback remain valid
    assert ingest.read_delta(cfg, v1, v1 + 1).count() > 0


def test_matview_full_recompute_after_rollback(tmp_path):
    """A refreshed matview must not stay pinned to retracted state: the
    rollback commit forces the refresh's full-recompute fallback."""
    from techtalk_data_pipeline_snowpark_ray.pipelines.matview import (
        read_matview, refresh_matview)

    cfg = _mk_cfg(tmp_path)
    chunks = list(generate_chunks(TINY))
    mid = len(chunks) // 2 or 1
    w = WalWriter(cfg.wal_dir, segment_rows=300, reorder_slack=64)
    for t, v in chunks[:mid]:
        w.append(t, v)
    w.flush()
    assert ingest.apply_tick(cfg) is not None
    oracle1 = wal_oracle(cfg.wal_dir)
    refresh_matview(cfg, "conv_live_stats")      # view refreshed at v1
    v_r = TableState(cfg.table_dir).latest_version()
    for t, v in chunks[mid:]:
        w.append(t, v)
    w.close()
    assert ingest.apply_tick(cfg) is not None
    # roll back to the refreshed version: the view's own runs restore
    # with it, but its refresh watermark now predates retracted history
    ingest.rollback(cfg, v_r)
    res = refresh_matview(cfg, "conv_live_stats")
    stats = res.metrics["matview_refresh"]
    assert stats["mode"] == "full"               # not delta-expressible
    assert stats["reason"] == "rollback"
    mv = read_matview(cfg, "conv_live_stats").to_pandas()
    exp = oracle1.groupby("conv_id").size()
    got = mv.set_index("conv_id")["n_turns"]
    assert got.sort_index().astype(int).equals(exp.sort_index().astype(int))


def test_clone_is_zero_copy_and_independent(tmp_path):
    spec = GenSpec(n_events=3000, n_conversations=60, max_turns=10,
                   zipf_s=1.2, ooo_window=16, dup_fraction=0.03,
                   partial_update_fraction=0.2, schema_add_at=1000,
                   schema_widen_at=2000, seed=5)
    src = _mk_cfg(tmp_path, "src")
    chunks = list(generate_chunks(spec))
    mid = len(chunks) // 2 or 1
    w = WalWriter(src.wal_dir, segment_rows=300, reorder_slack=64)
    for t, v in chunks[:mid]:
        w.append(t, v)
    w.flush()
    assert ingest.apply_tick(src) is not None
    oracle1 = wal_oracle(src.wal_dir)

    # clone SHARES the source WAL: it must resume at the source offset
    dst = EngineConfig(table_dir=str(tmp_path / "dst"),
                       wal_dir=src.wal_dir, num_buckets=4,
                       apply_mode="direct")
    m = ingest.clone_table(src, dst)
    assert m.version == 0 and m.metrics["cloned_from"]["version"] is not None
    clone_snap = _snap(dst)
    assert len(clone_snap) == len(oracle1)
    # zero-copy: shared files are hardlinks (one inode, two names)
    src_state, dst_state = TableState(src.table_dir), TableState(dst.table_dir)
    shared = m.table_run_files()
    assert shared and all(
        os.stat(os.path.join(src_state.runs_dir, f)).st_ino ==
        os.stat(os.path.join(dst_state.runs_dir, f)).st_ino
        for f in shared)

    # divergence: phase 2 lands in the shared WAL; tick ONLY the clone
    for t, v in chunks[mid:]:
        w.append(t, v)
    w.close()
    assert ingest.apply_tick(dst) is not None
    assert_matches_oracle(dst)                   # clone = full state
    assert len(_snap(src)) == len(oracle1)       # source untouched

    # independence under GC: source compacts + sweeps aggressively;
    # the clone's hardlinked references must survive
    ingest.compact(src)
    ingest.compact(src)
    src_state.gc_orphan_runs(keep_versions=1)
    assert_matches_oracle(dst)
    # and the clone keeps consuming (idle now) with offsets intact
    assert ingest.apply_tick(dst) is None


def test_clone_guards(tmp_path):
    src = _mk_cfg(tmp_path, "src")
    with pytest.raises(ValueError, match="no committed version"):
        ingest.clone_table(src, _mk_cfg(tmp_path, "d0"))
    write_wal(TINY, src.wal_dir, segment_rows=500)
    assert ingest.apply_tick(src) is not None
    with pytest.raises(ValueError, match="different table_dir"):
        ingest.clone_table(src, src)
    dst = _mk_cfg(tmp_path, "d1")
    ingest.clone_table(src, dst)
    with pytest.raises(ValueError, match="already has commits"):
        ingest.clone_table(src, dst)
