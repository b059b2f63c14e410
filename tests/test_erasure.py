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


def test_read_delta_refuses_window_spanning_erasure(tmp_path):
    cfg = _mk(tmp_path)
    victim = _build(cfg)
    v0 = TableState(cfg.table_dir).latest_version()
    ingest.erase_conversation(cfg, victim)
    with pytest.raises(ValueError, match="erasure"):
        ingest.read_delta(cfg, v0 - 1 if v0 else 0)


def test_erase_unknown_key_is_a_clean_noop_commit(tmp_path):
    cfg = _mk(tmp_path)
    _build(cfg)
    before = ingest.snapshot_to_pandas(cfg)
    m = ingest.erase_conversation(cfg, "conv-does-not-exist")
    assert m.metrics["erasure"]["rows_erased"] == 0
    assert m.metrics["erasure"]["files_rewritten"] == 0
    pd.testing.assert_frame_equal(ingest.snapshot_to_pandas(cfg), before)
