"""WAL segment layout (sources/wal.py), generator determinism
(sources/generate.py) and the schema-evolution normalize stage
(stages/normalize.py, the jsonToFields analogue)."""

import pyarrow as pa
import pytest

from techtalk_data_pipeline_snowpark_ray import schemas
from techtalk_data_pipeline_snowpark_ray.sources import wal
from techtalk_data_pipeline_snowpark_ray.sources.generate import (
    GenSpec, generate_chunks, write_wal)
from techtalk_data_pipeline_snowpark_ray.stages.normalize import normalize_batch


def _tbl(lsns):
    return pa.table({"lsn": pa.array(lsns, type=pa.int64()),
                     "op": ["insert"] * len(lsns)})


def test_segment_name_roundtrip():
    name = wal.segment_name(7, 100, 199, 2)
    assert wal.parse_segment_name(name) == (7, 100, 199, 2)
    assert wal.parse_segment_name("foo.parquet") is None
    assert wal.parse_segment_name(".tmp-abc.parquet") is None


def test_writer_cuts_disjoint_interval_segments(tmp_path):
    w = wal.WalWriter(str(tmp_path), segment_rows=10, reorder_slack=4)
    # bounded disorder: swap neighbours
    lsns = list(range(30))
    lsns[3], lsns[4] = lsns[4], lsns[3]
    lsns[17], lsns[18] = lsns[18], lsns[17]
    w.append(_tbl(lsns), 1)
    segs = w.close()
    assert [s.seq for s in segs] == list(range(len(segs)))
    for a, b in zip(segs, segs[1:]):
        assert b.lo >= a.hi  # disjoint (equality allowed for dups)
    assert sum(s.hi - s.lo + 1 for s in segs) >= 30


def test_writer_raises_on_unbounded_disorder(tmp_path):
    w = wal.WalWriter(str(tmp_path), segment_rows=5, reorder_slack=0)
    w.append(_tbl([50, 51, 52, 53, 54]), 1)   # cut immediately (slack 0)
    with pytest.raises(RuntimeError, match="interval contract"):
        w.append(_tbl([0, 1, 2, 3, 4]), 1)    # arrives 55 lsns late
        w.close()


def test_tail_by_seq(tmp_path):
    w = wal.WalWriter(str(tmp_path), segment_rows=5, reorder_slack=0)
    w.append(_tbl(list(range(20))), 1)
    w.close()
    assert len(wal.list_segments(str(tmp_path))) == 4
    tail = wal.list_segments(str(tmp_path), after_seq=1)
    assert [s.seq for s in tail] == [2, 3]
    assert wal.high_watermark(str(tmp_path)) == 19


def test_resuming_writer_continues_seq(tmp_path):
    w1 = wal.WalWriter(str(tmp_path), segment_rows=5, reorder_slack=0)
    w1.append(_tbl(list(range(10))), 1)
    w1.close()
    w2 = wal.WalWriter(str(tmp_path), segment_rows=5, reorder_slack=0)
    w2.append(_tbl(list(range(10, 20))), 1)
    segs = w2.close()
    assert [s.seq for s in segs] == [2, 3]


def test_generator_is_deterministic(tmp_path):
    spec = GenSpec(n_events=3000, n_conversations=30, ooo_window=8,
                   dup_fraction=0.05, schema_add_at=1000, seed=5)
    a = list(generate_chunks(spec))
    b = list(generate_chunks(spec))
    assert len(a) == len(b)
    for (ta, va), (tb, vb) in zip(a, b):
        assert va == vb and ta.equals(tb)


def test_generator_schema_versions(tmp_path):
    spec = GenSpec(n_events=300, n_conversations=10,
                   schema_add_at=100, schema_widen_at=200)
    segs = write_wal(spec, str(tmp_path), segment_rows=50)
    versions = {s.schema_version for s in segs}
    assert versions == {1, 2, 3}
    v1 = [s for s in segs if s.schema_version == 1]
    assert all(s.hi < 100 for s in v1)


def test_normalize_add_widen_case_and_extra():
    batch = pa.table({
        "CONV_ID": ["a"],                       # case-insensitive lookup
        "turn_idx": pa.array([1], type=pa.int32()),  # widen to int64
        "role": ["user"], "text": ["x"], "tool": [None],
        "ts": pa.array([0], type=pa.timestamp("us")),
        "junk": [42],                           # extra field -> dropped
        "lsn": pa.array([9], type=pa.int64()),
        "op": ["insert"],
    })
    out = normalize_batch(batch, schemas.TRANSCRIPT_V3, keep_extra=("lsn", "op"))
    assert out.schema.names == ["lsn", "op", *schemas.TRANSCRIPT_V3.names]
    assert out["turn_idx"].type == pa.int64()
    assert out["model"].null_count == 1          # missing column null-filled
    assert "junk" not in out.schema.names
    assert out["conv_id"][0].as_py() == "a"
