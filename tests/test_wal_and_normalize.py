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


# -- staged JSON source + parse/explode (S4/S5/S9/S10, T1/T3) --------------

def test_staged_json_stream_discovery_by_marker(tmp_path):
    from techtalk_data_pipeline_snowpark_ray.sources import staged_json as sj
    d = str(tmp_path / "stage")
    sj.stage_put(['{"n":1,"payload":"[{\\"event_id\\":1}]"}'], d, "000001")
    sj.stage_put(['{"n":1,"payload":"[{\\"event_id\\":2}]"}'], d, "000002")
    first = sj.list_staged_files(d)
    assert [f.key[:6] for f in first] == ["000001", "000002"]
    marker = first[-1].key
    # consumed files are never re-listed; a new file is
    assert sj.list_staged_files(d, after=marker) == []
    sj.stage_put(['{"n":1,"payload":"[{\\"event_id\\":3}]"}'], d, "000003")
    new = sj.list_staged_files(d, after=marker)
    assert len(new) == 1 and new[0].key.startswith("000003")
    # temp/foreign files are invisible
    (tmp_path / "stage" / ".tmp-x.json").write_text("{}")
    (tmp_path / "stage" / "other.txt").write_text("x")
    assert len(sj.list_staged_files(d)) == 3


def test_explode_json_array_types_nulls_and_extras():
    import json as _json
    from techtalk_data_pipeline_snowpark_ray.stages.jsonops import explode_json_array
    target = pa.schema([pa.field("a", pa.int64()), pa.field("b", pa.string()),
                        pa.field("ts", pa.timestamp("us"))])
    payloads = [
        _json.dumps([{"a": 1, "b": "x", "ts": "2024-01-01T00:00:00.000001",
                      "extra": 9},                      # extra field dropped
                     {"A": 2, "ts": "2024-01-01T00:00:00.000002"}]),  # case-insensitive, b null-filled
        _json.dumps({"a": 3, "b": "z", "ts": "2024-01-01T00:00:00.000003"}),  # single object = 1-array
        None,                                           # null payload skipped
    ]
    batch = pa.table({"payload": pa.array(payloads, pa.string())})
    out = explode_json_array(batch, "payload", target)
    assert out.schema == target
    assert out["a"].to_pylist() == [1, 2, 3]
    assert out["b"].to_pylist() == ["x", None, "z"]
    assert out["ts"][0].as_py().microsecond == 1


def test_explode_json_empty_string_is_malformed(tmp_path):
    """'' is malformed JSON (truncated upload), NOT a skippable NULL:
    strict mode raises and quarantine mode dead-letters it — it must
    never silently vanish."""
    import json as _json
    from techtalk_data_pipeline_snowpark_ray.stages.jsonops import (
        explode_json_array)
    target = pa.schema([pa.field("a", pa.int64())])
    batch = pa.table({"payload": pa.array(
        ["", _json.dumps([{"a": 1}]), None], pa.string())})
    with pytest.raises(Exception):
        explode_json_array(batch, "payload", target)
    qdir = str(tmp_path / "q")
    out = explode_json_array(batch, "payload", target,
                             quarantine_dir=qdir)
    assert out["a"].to_pylist() == [1]           # good row still lands
    import glob
    import json as _j
    dead_files = glob.glob(qdir + "/dead-*.json")
    assert len(dead_files) == 1
    recs = [_j.loads(ln) for ln in open(dead_files[0])]
    assert [r["payload"] for r in recs] == [""]


def test_staged_json_roundtrip_matches_source(tmp_path, ray_session):
    import os
    import pandas as pd
    from techtalk_data_pipeline_snowpark_ray.sources import staged_json as sj
    sf = "/root/testdata/sf0.001"
    d = str(tmp_path / "stage")
    n_files = sj.stage_events_as_json(sf, d)
    assert n_files >= 1
    ds, marker = sj.read_staged_json(d)
    got = ds.to_pandas().sort_values("event_id", ignore_index=True)
    import pyarrow.parquet as pq
    want = pq.read_table(os.path.join(sf, "events.parquet"),
                         columns=["event_id", "user_id", "event_type",
                                  "value", "ts"]).to_pandas() \
        .sort_values("event_id", ignore_index=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    # stream semantics: nothing new after consuming the marker
    ds2, marker2 = sj.read_staged_json(d, after=marker)
    assert ds2 is None and marker2 == marker


def test_staged_json_dead_letter_quarantine(tmp_path, ray_session):
    """Malformed payloads (bad JSON, non-array shape, uncastable field)
    divert to the stage's _quarantine dead-letter dir; good records in
    the SAME file still land typed; strict mode raises instead."""
    import json as _json
    from techtalk_data_pipeline_snowpark_ray.sources import staged_json as sj
    d = str(tmp_path / "stage")
    good = _json.dumps([{"event_id": 1, "user_id": 7, "event_type": "view",
                         "value": 1.5, "ts": "2024-01-01T00:00:00.000000"}])
    uncastable = _json.dumps([{"event_id": 2, "user_id": 8,
                               "event_type": "view", "value": "not-a-float",
                               "ts": "2024-01-01T00:00:00.000000"}])
    lines = [
        _json.dumps({"n": 1, "payload": good}),
        _json.dumps({"n": 1, "payload": "{broken json"}),
        _json.dumps({"n": 1, "payload": _json.dumps("just a string")}),
        _json.dumps({"n": 1, "payload": uncastable}),
    ]
    sj.stage_put(lines, d, "000001")
    ds, marker = sj.read_staged_json(d)
    got = ds.to_pandas()
    assert got["event_id"].tolist() == [1]        # only the good record
    dead = sj.read_quarantine(d).to_pandas()
    assert len(dead) == 3
    assert dead["error"].str.len().gt(0).all()
    assert set(dead["payload"]) == {"{broken json",
                                    _json.dumps("just a string"), uncastable}
    # quarantined lines never recycle: stream is drained after the marker
    ds2, _ = sj.read_staged_json(d, after=marker)
    assert ds2 is None
    # strict mode: same file raises
    sj.stage_put([lines[1]], str(tmp_path / "strict"), "000001")
    with pytest.raises(Exception):
        s, _ = sj.read_staged_json(str(tmp_path / "strict"), quarantine=False)
        s.materialize()


# -- HTTP source connector (S1-S3/S6: fetch -> stage landing) ---------------

def test_http_fetch_templating_and_stage_landing(tmp_path):
    """render_url substitutes {{params}} (and rejects unknowns);
    fetch_to_stage lands a JSON-array body as one atomically-published
    NDJSON staged file the stage-stream tail then reads exactly once.
    Hermetic: urllib against a file:// URL."""
    import json

    import pytest

    from techtalk_data_pipeline_snowpark_ray.sources import http_fetch
    from techtalk_data_pipeline_snowpark_ray.sources.staged_json import (
        list_staged_files)

    # values are percent-encoded: a raw space/&/# would make an invalid
    # or parameter-injecting request
    assert http_fetch.render_url("http://h/x/{{n}}/y?q={{q}}",
                                 {"n": 5, "q": "a b&x=1"}) \
        == "http://h/x/5/y?q=a%20b%26x%3D1"
    with pytest.raises(KeyError, match="missing"):
        http_fetch.render_url("http://h/{{missing}}", {})

    payload = [{"event_id": i, "user_id": i % 3, "event_type": "view"}
               for i in range(7)]
    src = tmp_path / "resp-3.json"
    src.write_text(json.dumps(payload))
    stage = str(tmp_path / "stage")
    url = "file://" + str(tmp_path) + "/resp-{{n}}.json"
    staged = http_fetch.fetch_to_stage(url, stage, key="000001",
                                       params={"n": 3})
    files = list_staged_files(stage)
    assert [f.path for f in files] == [staged]
    # RAW record arrays land WRAPPED in the staged envelope — the only
    # layout read_staged_json parses
    lines = [json.loads(ln) for ln in open(staged) if ln.strip()]
    assert all(set(ln) == {"n", "payload"} for ln in lines)
    assert [r for ln in lines for r in json.loads(ln["payload"])] == payload
    # retried fetch of the same body republishes the SAME name (content
    # digest): no duplicate delivery
    again = http_fetch.fetch_to_stage(url, stage, key="000001",
                                      params={"n": 3})
    assert again == staged and len(list_staged_files(stage)) == 1
    # fetch_json parses the body directly
    assert http_fetch.fetch_json(url, {"n": 3}) == payload
    # transient failure path: nonexistent file exhausts retries
    with pytest.raises(ConnectionError):
        http_fetch.fetch_text("file:///nonexistent-{{n}}", {"n": 1},
                              retries=1, backoff_s=0.01)
