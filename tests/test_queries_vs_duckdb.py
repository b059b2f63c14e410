"""Driver-gate rehearsal: run a representative subset of queries() and
compare against oracle_sql() via DuckDB at sf0.001 (the full sweep is
scripts/check_oracles.py; the per-round driver runs it at sf0.01)."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SUBSET = ["cdc_apply_full", "cdc_schema_evolution", "q1_pricing_summary",
          "dq_overpaid_orders", "top_segments_last7d", "events_sessionize",
          "token_counts", "exact_dedup_documents", "ann_topk_cosine",
          "union_tag", "user_journeys", "cdc_render_transcripts",
          "user_moving_sum", "users_view_purchase_setops",
          "embedding_near_dup_lsh", "minhash_near_dup",
          "cdc_matview_role_stats", "cdc_matview_hourly_activity",
          "cdc_matview_role_tool_stats", "cdc_time_travel",
          "cdc_changefeed_delta", "cdc_export_roundtrip",
          "cdc_replicated_table", "media_audio_features",
          "media_video_frame_features", "cdc_rollback_restore",
          "cdc_rollback_rewind", "cdc_clone_divergence",
          "cdc_token_index", "cdc_token_search",
          "cdc_erase_conversation", "cdc_token_search_bool",
          "cdc_ann_search", "cdc_hybrid_search", "cdc_join_matview_drift"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), ignore_index=True)


def to_pandas(res):
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(con, name):
    got = canon(to_pandas(entrymod.queries()[name](SF)))
    want = canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=True)


def test_all_oracle_keys_have_queries():
    qs = entrymod.queries()
    missing = [k for k in entrymod.oracle_sql() if k not in qs]
    assert not missing


def test_entry_smoke():
    res = entrymod.entry()
    import ray.data
    assert isinstance(res, ray.data.Dataset)
    assert res.count() > 0
    names = res.schema().names
    assert names[:2] == ["conv_id", "turn_idx"]


def test_minhash_dedup_clusters_oracle_on_distributed_cc(con, monkeypatch):
    """Judge gate for the distributed connected-components path: with
    the pair-count threshold forced to 0, minhash_dedup_clusters still
    matches its DuckDB oracle value-exactly."""
    from techtalk_data_pipeline_snowpark_ray.functions import dedup
    monkeypatch.setattr(dedup, "CC_DISTRIBUTED_PAIRS", 0)
    got = canon(to_pandas(entrymod.queries()["minhash_dedup_clusters"](SF)))
    want = canon(con.sql(entrymod.oracle_sql()["minhash_dedup_clusters"]).df())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
