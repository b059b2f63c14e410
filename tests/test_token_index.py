"""Inverted text index (grouped matview `token_index`) + index-pruned
search (`matview.search_token` over `read_snapshot(buckets=...)`).
Parity oracle: brute-force tokenization of the resolved snapshot."""

import re
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from techtalk_data_pipeline_snowpark_ray.config import EngineConfig
from techtalk_data_pipeline_snowpark_ray.pipelines import ingest
from techtalk_data_pipeline_snowpark_ray.pipelines.matview import (
    TOKEN_SPLIT_RE, read_grouped_matview, refresh_matview, search_token,
    token_buckets)
from techtalk_data_pipeline_snowpark_ray.sources.generate import (
    GenSpec, generate_chunks)
from techtalk_data_pipeline_snowpark_ray.sources.wal import WalWriter
from techtalk_data_pipeline_snowpark_ray.stages.partition import \
    hash_strings_arrow

SPEC = GenSpec(n_events=3000, n_conversations=60, max_turns=10,
               zipf_s=1.2, ooo_window=16, dup_fraction=0.02,
               partial_update_fraction=0.2, schema_add_at=1000,
               schema_widen_at=2000, seed=7)


def _mk_cfg(tmp_path):
    cfg = EngineConfig(table_dir=str(tmp_path / "t"),
                       wal_dir=str(tmp_path / "w"),
                       num_buckets=8, apply_mode="direct")
    cfg.ensure_dirs()
    return cfg


def _build_two_phase(cfg):
    """Two ticks with a refresh at the boundary, so the final index
    state comes from a full refresh + an incremental one."""
    chunks = list(generate_chunks(SPEC))
    mid = len(chunks) // 2 or 1
    w = WalWriter(cfg.wal_dir, segment_rows=600, reorder_slack=64)
    for t, v in chunks[:mid]:
        w.append(t, v)
    w.flush()
    assert ingest.apply_tick(cfg) is not None
    m1 = refresh_matview(cfg, "token_index")
    assert m1.metrics["matview_refresh"]["mode"] == "full"
    for t, v in chunks[mid:]:
        w.append(t, v)
    w.close()
    assert ingest.apply_tick(cfg) is not None
    m2 = refresh_matview(cfg, "token_index")
    assert m2.metrics["matview_refresh"]["mode"] == "incremental"


def _brute(snap: pd.DataFrame):
    hits = Counter()
    convs = defaultdict(set)
    for _, r in snap.iterrows():
        if r["text"] is None:
            continue
        for tok in re.split(TOKEN_SPLIT_RE, str(r["text"]).lower()):
            if tok:
                hits[tok] += 1
                convs[tok].add(r["conv_id"])
    return hits, convs


def test_token_index_matches_brute_force_after_incremental(tmp_path):
    cfg = _mk_cfg(tmp_path)
    _build_two_phase(cfg)
    idx = read_grouped_matview(cfg, "token_index").to_pandas()
    hits, convs = _brute(ingest.snapshot_to_pandas(cfg))
    assert len(idx) == len(hits)
    g = idx.set_index("token")
    for tok, n in hits.items():
        assert int(g.loc[tok, "n_hits"]) == n
        assert int(g.loc[tok, "n_convs"]) == len(convs[tok])


def test_search_token_pruned_and_exact(tmp_path):
    cfg = _mk_cfg(tmp_path)
    _build_two_phase(cfg)
    snap = ingest.snapshot_to_pandas(cfg)
    hits, convs = _brute(snap)

    def brute_rows(tok):
        mask = snap["text"].fillna("").map(
            lambda s: tok in re.split(TOKEN_SPLIT_RE, s.lower()))
        return snap[mask]

    # a single-conversation token must prune to exactly its bucket
    rare = min((t for t in hits if len(convs[t]) == 1),
               key=lambda t: (hits[t], t))
    bs, nb = token_buckets(cfg, rare)
    conv = next(iter(convs[rare]))
    expect_bucket = int(hash_strings_arrow(
        pa.array([conv], pa.string()))[0] % np.uint64(nb))
    assert bs == [expect_bucket]
    got = search_token(cfg, rare).to_pandas()
    exp = brute_rows(rare)
    assert len(got) == len(exp)
    assert set(map(tuple, got[["conv_id", "turn_idx"]].to_numpy())) \
        == set(map(tuple, exp[["conv_id", "turn_idx"]].to_numpy()))

    # a multi-bucket token: result still exact across buckets
    hot = max(hits, key=lambda t: len(convs[t]))
    got = search_token(cfg, hot).to_pandas()
    assert len(got) == len(brute_rows(hot))

    # an absent token searches to empty (index says no bucket has it)
    bs, _ = token_buckets(cfg, "no-such-token-xyzzy")
    assert bs == []
    assert search_token(cfg, "no-such-token-xyzzy").count() == 0


def test_search_tokens_boolean_semantics(tmp_path):
    from techtalk_data_pipeline_snowpark_ray.pipelines.matview import \
        search_tokens

    cfg = _mk_cfg(tmp_path)
    _build_two_phase(cfg)
    snap = ingest.snapshot_to_pandas(cfg)
    hits, convs = _brute(snap)

    def row_tokens(s):
        return set(t for t in re.split(TOKEN_SPLIT_RE,
                                       ("" if s is None else s).lower())
                   if t)

    toksets = snap["text"].map(row_tokens)
    # two rare single-conversation tokens from different rows
    rares = sorted(t for t in hits if len(convs[t]) == 1)[:2]
    hot = max(hits, key=lambda t: hits[t])

    # AND of a hot and a rare token = exactly the rare rows also
    # containing the hot token, scanned at the rare token's cost
    got = search_tokens(cfg, all_of=(hot, rares[0])).to_pandas()
    exp = snap[toksets.map(lambda s: hot in s and rares[0] in s)]
    assert len(got) == len(exp)

    # OR of the two rares = union of their rows
    got = search_tokens(cfg, any_of=rares).to_pandas()
    exp = snap[toksets.map(lambda s: bool(set(rares) & s))]
    assert len(got) == len(exp)
    assert set(got["conv_id"]) == set(exp["conv_id"])

    # AND with an absent required token short-circuits to empty
    assert search_tokens(cfg, all_of=(hot, "zz-absent-zz")).count() == 0

    with pytest.raises(ValueError, match="at least one token"):
        search_tokens(cfg)


def test_search_requires_refreshed_index(tmp_path):
    cfg = _mk_cfg(tmp_path)
    chunks = list(generate_chunks(SPEC))
    w = WalWriter(cfg.wal_dir, segment_rows=600, reorder_slack=64)
    for t, v in chunks:
        w.append(t, v)
    w.close()
    ingest.apply_tick(cfg)
    with pytest.raises(ValueError, match="never been refreshed"):
        search_token(cfg, "anything")


def test_bucket_restricted_snapshot_read(tmp_path):
    """read_snapshot(buckets=...) partitions the table: per-bucket
    slices are disjoint, union to the full snapshot, and agree with
    the key-hash bucket assignment."""
    cfg = _mk_cfg(tmp_path)
    _build_two_phase(cfg)
    full = ingest.snapshot_to_pandas(cfg)
    nb = cfg.num_buckets
    kh = hash_strings_arrow(pa.array(full["conv_id"], pa.string()))
    full_bucket = (kh % np.uint64(nb)).astype(int)
    seen = 0
    for b in range(nb):
        part = ingest.read_snapshot(cfg, buckets=[b]).to_pandas()
        exp = full[full_bucket == b]
        assert len(part) == len(exp)
        if len(part):
            assert set(part["conv_id"]) == set(exp["conv_id"])
        seen += len(part)
    assert seen == len(full)
    assert ingest.read_snapshot(cfg, buckets=[]).count() == 0
